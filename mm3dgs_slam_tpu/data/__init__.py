"""Dataset loaders (numpy-based, torch-free).

Keeps the reference's gradslam-style surface: each dataset yields
``(color HWC float 0-255, depth HW1 meters, intrinsics 4x4, c2w pose 4x4,
imu | None)`` per frame (gradslam_datasets/basedataset.py:324-377).
"""
from .base import RGBDDataset
from .tum import TUMDataset
from .utmm import UTMMDataset
from .replica import ReplicaDataset, ReplicaV2Dataset
from .synthetic import SyntheticDataset

_REGISTRY = {
    "tum": TUMDataset,
    "utmm": UTMMDataset,
    "replica": ReplicaDataset,
    "replicav2": ReplicaV2Dataset,
    "synthetic": SyntheticDataset,
}


def get_dataset_type(name: str):
    """Mirror of slam/SLAM.py:27-35; extra loaders register lazily."""
    key = name.lower()
    if key in _REGISTRY:
        return _REGISTRY[key]
    # Lazily import the low-traffic loaders so optional deps stay optional.
    from . import extra

    if key in extra.REGISTRY:
        return extra.REGISTRY[key]
    raise ValueError(f"Unknown dataset {name}")
