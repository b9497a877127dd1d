"""Sensor interface: the contract live inputs would implement.

Rebuild of the reference's ``RGBDSensor`` abstract base (SURVEY.md §2.1
"Sensor base + recording"): ``createFirstConnected`` / per-frame depth+color
acquisition / intrinsics / record-to-``.sens``. Per the north star, the live
device backends (Kinect v1/v2, PrimeSense, StructureSensor, RealSense) are
NOT ported — the interface is kept so they could be, and recorded-data
replayers implement it today.
"""

from __future__ import annotations

import abc
from typing import Iterator

import numpy as np

from ..geometry.camera import CameraModel


class RGBDSensor(abc.ABC):
    """Frame source contract. Implementations: dataset replayers (today),
    live-device backends (future)."""

    @property
    @abc.abstractmethod
    def camera(self) -> CameraModel:
        """Depth-registered intrinsics."""

    @abc.abstractmethod
    def frames(self) -> Iterator[tuple[np.ndarray, np.ndarray, float]]:
        """Yield (depth [H,W] float32 meters, color [H,W,3] float32 [0,1],
        timestamp seconds) until the stream ends."""

    def record_to(self, path: str, poses: np.ndarray | None = None) -> None:
        """Dump the whole stream to a ``.sens`` container (the reference's
        record-to-disk path on RGBDSensor)."""
        from . import sens

        depth, color, ts = [], [], []
        for d, c, t in self.frames():
            depth.append(d)
            color.append(c)
            ts.append(t)
        n = len(depth)
        if poses is None:
            poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        sens.write_sens(path, np.stack(depth), np.stack(color), poses, self.camera)


class ReplaySensor(RGBDSensor):
    """Adapter: any replayer source (SyntheticSource/TumSource/SensSource)
    exposed through the RGBDSensor interface."""

    def __init__(self, source, fps: float = 30.0):
        self._source = source
        self._fps = fps

    @property
    def camera(self) -> CameraModel:
        return self._source.camera

    def frames(self):
        for i in range(len(self._source)):
            d, c = self._source.get(i)
            yield d, c, i / self._fps
