"""Kalman filter for box tracking (reference: ultralytics/trackers/utils/
kalman_filter.py — KalmanFilterXYAH). Constant-velocity model over
(x, y, aspect, height) + velocities; host-side numpy."""

from __future__ import annotations

import numpy as np


class KalmanFilterXYAH:
    """8-state constant-velocity Kalman filter on (cx, cy, a, h, vx, vy, va, vh)."""

    def __init__(self):
        ndim, dt = 4, 1.0
        self._motion_mat = np.eye(2 * ndim)
        for i in range(ndim):
            self._motion_mat[i, ndim + i] = dt
        self._update_mat = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement: np.ndarray):
        mean = np.concatenate([measurement, np.zeros(4)])
        h = measurement[3]
        std = np.array(
            [2 * self._std_weight_position * h, 2 * self._std_weight_position * h, 1e-2, 2 * self._std_weight_position * h,
             10 * self._std_weight_velocity * h, 10 * self._std_weight_velocity * h, 1e-5, 10 * self._std_weight_velocity * h]
        )
        return mean, np.diag(std**2)

    def predict(self, mean, covariance):
        h = mean[3]
        std_pos = [self._std_weight_position * h] * 2 + [1e-2, self._std_weight_position * h]
        std_vel = [self._std_weight_velocity * h] * 2 + [1e-5, self._std_weight_velocity * h]
        motion_cov = np.diag(np.square(np.concatenate([std_pos, std_vel])))
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean, covariance):
        h = mean[3]
        std = [self._std_weight_position * h] * 2 + [1e-1, self._std_weight_position * h]
        innovation_cov = np.diag(np.square(std))
        mean_p = self._update_mat @ mean
        cov_p = self._update_mat @ covariance @ self._update_mat.T + innovation_cov
        return mean_p, cov_p

    def update(self, mean, covariance, measurement):
        mean_p, cov_p = self.project(mean, covariance)
        # Kalman gain via solve (cholesky in the reference)
        gain = np.linalg.solve(cov_p.T, (covariance @ self._update_mat.T).T).T
        innovation = measurement - mean_p
        new_mean = mean + gain @ innovation
        new_cov = covariance - gain @ cov_p @ gain.T
        return new_mean, new_cov


class KalmanFilterXYWH(KalmanFilterXYAH):
    """8-state constant-velocity filter on (cx, cy, w, h) + velocities
    (reference trackers/utils/kalman_filter.py KalmanFilterXYWH — the BoT-SORT
    / TrackTrack state). Noise stds scale with BOTH w and h (XYAH scales with
    h only), and ``update`` accepts an optional NSA confidence that shrinks
    measurement noise for high-confidence detections (GIAO-Tracker NSA-Kalman,
    used by TrackTrack's re-bind/update)."""

    def _stds(self, mean, weight):
        w, h = mean[2], mean[3]
        return [weight * w, weight * h, weight * w, weight * h]

    def initiate(self, measurement: np.ndarray):
        mean = np.concatenate([measurement, np.zeros(4)])
        p = self._stds(measurement, 2 * self._std_weight_position)
        v = self._stds(measurement, 10 * self._std_weight_velocity)
        return mean, np.diag(np.square(np.array(p + v)))

    def predict(self, mean, covariance):
        p = self._stds(mean, self._std_weight_position)
        v = self._stds(mean, self._std_weight_velocity)
        motion_cov = np.diag(np.square(np.array(p + v)))
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean, covariance, confidence: float = 0.0):
        std = np.array(self._stds(mean, self._std_weight_position))
        innovation_cov = np.diag(np.square(std * (1.0 - confidence)))
        mean_p = self._update_mat @ mean
        cov_p = self._update_mat @ covariance @ self._update_mat.T + innovation_cov
        return mean_p, cov_p

    def update(self, mean, covariance, measurement, confidence: float = 0.0):
        mean_p, cov_p = self.project(mean, covariance, confidence)
        gain = np.linalg.solve(cov_p.T, (covariance @ self._update_mat.T).T).T
        innovation = measurement - mean_p
        new_mean = mean + gain @ innovation
        new_cov = covariance - gain @ cov_p @ gain.T
        return new_mean, new_cov
