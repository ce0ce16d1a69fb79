"""Scalar NumPy re-implementation of the reference front-end math.

Used as the golden model for kernel tests (SURVEY.md §4: 'per-kernel golden
tests against reference-math re-implementations'). Each function transcribes
the corresponding reference routine's arithmetic directly (loops and all) so
the TPU kernels can be checked against independent code.
"""
import numpy as np

from slam_tpu.ops.orb_pattern import ORB_PATTERN

HALF_PATCH = 15


def ref_u_max():
    """orb_extractor.cpp:174-186"""
    u_max = np.zeros(HALF_PATCH + 1, dtype=np.int64)
    vmax = int(np.floor(HALF_PATCH * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(HALF_PATCH * np.sqrt(2.0) / 2))
    for v in range(vmax + 1):
        u_max[v] = int(round(np.sqrt(HALF_PATCH**2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while u_max[v0] == u_max[v0 + 1]:
            v0 += 1
        u_max[v] = v0
        v0 += 1
    return u_max


def ref_fast_atan2_deg(y, x):
    """cv::fastAtan2 scalar float32 model."""
    y = np.float32(y)
    x = np.float32(x)
    p1 = np.float32(0.9997878412794807 * 180 / np.pi)
    p3 = np.float32(-0.3258083974640975 * 180 / np.pi)
    p5 = np.float32(0.1555786518463281 * 180 / np.pi)
    p7 = np.float32(-0.04432655554792128 * 180 / np.pi)
    eps = np.float32(2.220446049250313e-16)
    ax, ay = abs(x), abs(y)
    if ax >= ay:
        c = np.float32(ay / (ax + eps))
        c2 = np.float32(c * c)
        a = np.float32(((p7 * c2 + p5) * c2 + p3) * c2 * c + p1 * c)
    else:
        c = np.float32(ax / (ay + eps))
        c2 = np.float32(c * c)
        a = np.float32(90.0) - np.float32(((p7 * c2 + p5) * c2 + p3) * c2 * c + p1 * c)
    if x < 0:
        a = np.float32(180.0) - a
    if y < 0:
        a = np.float32(360.0) - a
    return np.float32(a)


def ref_ic_angle(img, x, y):
    """orb_extractor.cpp:245-275, integer arithmetic on a uint8 image."""
    u_max = ref_u_max()
    m01, m10 = 0, 0
    for u in range(-HALF_PATCH, HALF_PATCH + 1):
        m10 += u * int(img[y, x + u])
    for v in range(1, HALF_PATCH + 1):
        v_sum = 0
        d = int(u_max[v])
        for u in range(-d, d + 1):
            val_plus = int(img[y + v, x + u])
            val_minus = int(img[y - v, x + u])
            v_sum += val_plus - val_minus
            m10 += u * (val_plus + val_minus)
        m01 += v * v_sum
    return ref_fast_atan2_deg(m01, m10)


def ref_fast_cos(v):
    """openvslam/trigonometric.h:17-42, float32 scalar."""
    PI = np.float32(3.14159265358979)
    PI_2 = np.float32(PI / 2)
    TWO_PI = np.float32(2 * PI)
    INV_TWO_PI = np.float32(1.0 / TWO_PI)
    THREE_PI_2 = np.float32(3 * PI_2)

    def core(x):
        c1 = np.float32(0.99940307)
        c2 = np.float32(-0.49558072)
        c3 = np.float32(0.03679168)
        x2 = np.float32(x * x)
        return np.float32(c1 + x2 * (c2 + c3 * x2))

    v = np.float32(v)
    v = np.float32(v - np.floor(v * INV_TWO_PI) * TWO_PI)
    v = np.float32(abs(v))
    if v < PI_2:
        return core(v)
    if v < PI:
        return np.float32(-core(np.float32(PI - v)))
    if v < THREE_PI_2:
        return np.float32(-core(np.float32(v - PI)))
    return core(np.float32(TWO_PI - v))


def ref_fast_sin(v):
    return ref_fast_cos(np.float32(np.float32(3.14159265358979) / 2 - np.float32(v)))


def _cv_round(x):
    return int(np.rint(x))


def ref_descriptor(img, x, y, angle_deg):
    """orb_extractor.cpp:284-352 scalar path -> 32 bytes."""
    angle = np.float32(angle_deg * np.float32(np.pi) / np.float32(180.0))
    ca = ref_fast_cos(angle)
    sa = ref_fast_sin(angle)
    pat = ORB_PATTERN.astype(np.float32)
    desc = np.zeros(32, dtype=np.uint8)
    for byte in range(32):
        val = 0
        for bit in range(8):
            i = byte * 8 + bit
            p0a, p1a, p0b, p1b = pat[i]
            ra = _cv_round(np.float32(p0a * sa + p1a * ca))
            caa = _cv_round(np.float32(p0a * ca - p1a * sa))
            rb = _cv_round(np.float32(p0b * sa + p1b * ca))
            cab = _cv_round(np.float32(p0b * ca - p1b * sa))
            a = img[y + ra, x + caa]
            b = img[y + rb, x + cab]
            if a < b:
                val |= 1 << bit
        desc[byte] = val
    return desc


def bytes_to_words(desc_bytes):
    """32 uint8 -> 8 uint32 little-endian (key_point.hpp uint32[8] layout)."""
    return np.frombuffer(np.asarray(desc_bytes, dtype=np.uint8).tobytes(), dtype="<u4").copy()


def ref_bilinear_resize(img, out_h, out_w):
    """cv::resize INTER_LINEAR float model: src = (dst+0.5)*scale-0.5.

    Row loop kept scalar (independent of the kernel's matmul formulation);
    columns vectorized for test speed.
    """
    in_h, in_w = img.shape
    sy = in_h / out_h
    sx = in_w / out_w
    fx = (np.arange(out_w) + 0.5) * sx - 0.5
    x0 = np.floor(fx).astype(int)
    wx = fx - x0
    x0c = np.clip(x0, 0, in_w - 1)
    x1c = np.clip(x0 + 1, 0, in_w - 1)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        fy = (i + 0.5) * sy - 0.5
        y0 = int(np.floor(fy))
        wy = fy - y0
        y0c = min(max(y0, 0), in_h - 1)
        y1c = min(max(y0 + 1, 0), in_h - 1)
        row0 = (1 - wx) * img[y0c, x0c] + wx * img[y0c, x1c]
        row1 = (1 - wx) * img[y1c, x0c] + wx * img[y1c, x1c]
        out[i] = (1 - wy) * row0 + wy * row1
    return out


def ref_gaussian_blur_7x7_s2(img):
    """cv::GaussianBlur(size 7, sigma 2, BORDER_REFLECT_101) float model."""
    x = np.arange(7) - 3.0
    k = np.exp(-0.5 * x * x / 4.0)
    k /= k.sum()
    h, w = img.shape

    def reflect_idx(n):
        # reflect-101 index map for offsets -3..3, per output index
        base = np.arange(n)
        maps = []
        for t in range(-3, 4):
            i = base + t
            i = np.where(i < 0, -i, i)
            i = np.where(i >= n, 2 * (n - 1) - i, i)
            maps.append(i)
        return maps

    rows = reflect_idx(h)
    tmp = np.zeros_like(img, dtype=np.float64)
    for t in range(7):
        tmp += k[t] * img[rows[t], :]
    cols = reflect_idx(w)
    out = np.zeros_like(tmp)
    for t in range(7):
        out += k[t] * tmp[:, cols[t]]
    return out
