"""Pinhole rectification for rgb + depth frames.

Parity: autolabel/undistort.py:6-31 (cv2 initUndistortRectifyMap + remap,
OPENCV model k1 k2 p1 p2).
"""
import cv2
import numpy as np


class ImageUndistorter:

    def __init__(self, camera_matrix, distortion_coefficients, size):
        self.K = np.asarray(camera_matrix)
        self.D = np.asarray(distortion_coefficients)
        self.size = tuple(size)
        # Remap onto the ORIGINAL K (reference undistort.py:26-28 passes
        # newCameraMatrix=K): intrinsics.txt written by the mapping stage
        # then stays valid for the rectified pixels. Using
        # getOptimalNewCameraMatrix here would silently change the
        # effective intrinsics of rgb/depth while downstream ray
        # generation and ScaleEstimation keep reading the SfM K.
        self.new_K = self.K.copy()
        self.map_x, self.map_y = cv2.initUndistortRectifyMap(
            self.K, self.D, None, self.new_K, self.size, cv2.CV_32FC1)

    def undistort(self, image, depth=False):
        interpolation = cv2.INTER_NEAREST if depth else cv2.INTER_LINEAR
        return cv2.remap(image, self.map_x, self.map_y, interpolation)
