"""Replica sequence loader (gradslam_datasets/replica.py:13-67).

Frames live under ``results/frame*.jpg`` + ``results/depth*.png``; poses are
flattened 4x4 rows in ``traj.txt``.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from .base import RGBDDataset, natsorted


class ReplicaDataset(RGBDDataset):
    def get_filepaths(self):
        colors = natsorted(glob.glob(os.path.join(self.input_folder, "results", "frame*.jpg")))
        depths = natsorted(glob.glob(os.path.join(self.input_folder, "results", "depth*.png")))
        return colors, depths

    def load_poses(self):
        lines = np.loadtxt(os.path.join(self.input_folder, "traj.txt")).reshape(-1, 4, 4)
        return [lines[i].astype(np.float32) for i in range(len(self.color_paths))]
