from setuptools import setup, find_packages

setup(
    name="scenerf_tpu",
    version="0.1.0",
    description=(
        "TPU-native (JAX/XLA/Pallas) framework for self-supervised monocular 3D "
        "scene reconstruction with radiance fields (SceneRF capabilities)"
    ),
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
)
