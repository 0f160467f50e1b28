"""SemanticKITTI voxel IO: bit packing, label/invalid readers, class remap LUT.

Contract: ref scenerf/data/semantic_kitti/io_data.py:10-42, :120-127, :173-192.
The 20-class learning map is standard SemanticKITTI dataset metadata, embedded
here so no yaml file is required (a yaml path can still be supplied).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

# SemanticKITTI learning_map (raw label -> train id, 20 classes incl. empty)
LEARNING_MAP = {
    0: 0, 1: 0, 10: 1, 11: 2, 13: 5, 15: 3, 16: 5, 18: 4, 20: 5, 30: 6,
    31: 7, 32: 8, 40: 9, 44: 10, 48: 11, 49: 12, 50: 13, 51: 14, 52: 0,
    60: 9, 70: 15, 71: 16, 72: 17, 80: 18, 81: 19, 99: 0, 252: 1, 253: 7,
    254: 6, 255: 8, 256: 5, 257: 5, 258: 4, 259: 5,
}

CLASS_NAMES = (
    "empty", "car", "bicycle", "motorcycle", "truck", "other-vehicle",
    "person", "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
    "other-ground", "building", "fence", "vegetation", "trunk", "terrain",
    "pole", "traffic-sign",
)

N_CLASSES = 20

# per-class voxel counts over the train split (dataset statistics,
# ref scenerf/data/semantic_kitti/params.py:3-25) -- used for class-balanced
# weighting in downstream semantic tasks
CLASS_FREQUENCIES = np.array([
    5.41773033e09, 1.57835390e07, 1.25136000e05, 1.18809000e05,
    6.46799000e05, 8.21951000e05, 2.62978000e05, 2.83696000e05,
    2.04750000e05, 6.16887030e07, 4.50296100e06, 4.48836500e07,
    2.26992300e06, 5.68402180e07, 1.57196520e07, 1.58442623e08,
    2.06162300e06, 3.69705220e07, 1.15198800e06, 3.34146000e05,
])


def unpack(compressed: np.ndarray) -> np.ndarray:
    """Bit-packed uint8 -> one byte per voxel (MSB first)
    (ref io_data.py:10-22)."""
    out = np.zeros(compressed.shape[0] * 8, dtype=np.uint8)
    for i in range(8):
        out[i::8] = (compressed >> (7 - i)) & 1
    return out


def pack(array: np.ndarray) -> np.ndarray:
    """Boolean/binary array -> bit-packed uint8 (ref io_data.py:33-42)."""
    a = array.reshape(-1).astype(np.uint8)
    out = np.zeros(a.shape[0] // 8, dtype=np.uint8)
    for i in range(8):
        out |= a[i::8] << (7 - i)
    return out


def get_remap_lut(yaml_path: Optional[str] = None) -> np.ndarray:
    """Raw-label -> train-id LUT with 0 meaning 'empty' and unlabeled -> 255
    (ref io_data.py:173-192)."""
    mapping = LEARNING_MAP
    if yaml_path is not None:
        import yaml
        mapping = yaml.safe_load(open(yaml_path))["learning_map"]
    maxkey = max(mapping.keys())
    lut = np.zeros(maxkey + 100, dtype=np.int32)
    lut[list(mapping.keys())] = list(mapping.values())
    lut[lut == 0] = 255
    lut[0] = 0
    return lut


def read_label(path: str) -> np.ndarray:
    """uint16 semantic labels per voxel (ref io_data.py:120-123)."""
    return np.fromfile(path, dtype=np.uint16).astype(np.float32)


def read_invalid(path: str) -> np.ndarray:
    """Bit-packed invalid mask (ref io_data.py:125-127)."""
    return unpack(np.fromfile(path, dtype=np.uint8)).astype(np.float32)


def read_occupancy(path: str) -> np.ndarray:
    """Bit-packed occupancy (.bin) -> float 0/1 per voxel."""
    return unpack(np.fromfile(path, dtype=np.uint8)).astype(np.float32)


def read_semantic_voxels(
    label_path: str, invalid_path: str, yaml_path: Optional[str] = None,
    shape=(256, 256, 32),
) -> np.ndarray:
    """Remapped [256, 256, 32] training labels, invalid voxels set to 255
    (ref kitti_dataset.py:406-420)."""
    lut = get_remap_lut(yaml_path)
    label = lut[read_label(label_path).astype(np.uint16)].astype(np.float32)
    invalid = read_invalid(invalid_path)
    label[np.isclose(invalid, 1)] = 255
    return label.reshape(shape)
