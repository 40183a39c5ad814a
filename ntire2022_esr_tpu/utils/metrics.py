"""PSNR / SSIM, bit-compatible with the reference scoring code.

Mirrors utils/utils_image.py:490-554: PSNR on [0,255] float64 RGB with
border crop; SSIM with the MATLAB 11x11 sigma=1.5 Gaussian window and 5-px
valid crop. The reference's 3-channel SSIM quirk (it averages three
identical full-HWC SSIM evaluations, utils_image.py:523-527) produces the
same number as a single evaluation, which is what we compute.
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def calculate_psnr(img1: np.ndarray, img2: np.ndarray, border: int = 0) -> float:
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    h, w = img1.shape[:2]
    img1 = img1[border : h - border, border : w - border]
    img2 = img2[border : h - border, border : w - border]
    mse = np.mean((img1.astype(np.float64) - img2.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * math.log10(255.0 / math.sqrt(mse))


def _ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray, border: int = 0) -> float:
    """MATLAB-style SSIM on [0,255] images, border-cropped."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    h, w = img1.shape[:2]
    img1 = img1[border : h - border, border : w - border]
    img2 = img2[border : h - border, border : w - border]
    if img1.ndim == 2:
        return _ssim(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 3:
            # reference averages 3 identical full-HWC evaluations == 1 eval
            return _ssim(img1, img2)
        if img1.shape[2] == 1:
            return _ssim(np.squeeze(img1), np.squeeze(img2))
    raise ValueError("Wrong input image dimensions.")
