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
    entry_points={
        "console_scripts": [
            # the 13 public entry points mirroring the reference scripts
            # (SURVEY.md section 2.5)
            "scenerf-train-kitti=scenerf_tpu.cli.train:train_kitti",
            "scenerf-train-bundlefusion=scenerf_tpu.cli.train:train_bundlefusion",
            "scenerf-save-depth-metrics=scenerf_tpu.cli.evaluation:save_depth_metrics",
            "scenerf-save-depth-metrics-bf=scenerf_tpu.cli.evaluation:save_depth_metrics_bf",
            "scenerf-agg-depth-metrics=scenerf_tpu.cli.evaluation:agg_depth_metrics",
            "scenerf-agg-depth-metrics-bf=scenerf_tpu.cli.evaluation:agg_depth_metrics_bf",
            "scenerf-render-colors=scenerf_tpu.cli.evaluation:render_colors",
            "scenerf-render-colors-bf=scenerf_tpu.cli.evaluation:render_colors_bf",
            "scenerf-eval-color=scenerf_tpu.cli.evaluation:eval_color",
            "scenerf-eval-color-bf=scenerf_tpu.cli.evaluation:eval_color_bf",
            "scenerf-eval-sr=scenerf_tpu.cli.evaluation:eval_sr",
            "scenerf-eval-sc-bf=scenerf_tpu.cli.evaluation:eval_sc_bf",
            "scenerf-generate-novel-depths=scenerf_tpu.cli.reconstruction:generate_novel_depths",
            "scenerf-generate-novel-depths-bf=scenerf_tpu.cli.reconstruction:generate_novel_depths_bf",
            "scenerf-depth2tsdf=scenerf_tpu.cli.reconstruction:depth2tsdf",
            "scenerf-depth2tsdf-bf=scenerf_tpu.cli.reconstruction:depth2tsdf_bf",
            "scenerf-generate-sc-gt-bf=scenerf_tpu.cli.reconstruction:generate_sc_gt_bf",
            "scenerf-determine-angles=scenerf_tpu.cli.reconstruction:determine_angles",
        ]
    },
)
