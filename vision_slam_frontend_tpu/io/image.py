"""Host-side image decoding: JPEG/PNG + Bayer demosaic to grayscale.

The TPU-native pipeline keeps image decode on the host CPU feeding the device
(the reference does the same with cv::imdecode on its single CPU;
reference: src/slam_frontend_main.cc:98-109 DecodeImage). Uses OpenCV when
available, PIL otherwise.
"""

from __future__ import annotations

import numpy as np


def decode_image_bytes(data: bytes, fmt: str = "") -> np.ndarray:
    """Decode compressed image bytes to grayscale float32 (H, W).

    Mirrors the reference's DecodeImage: grayscale decode, with the
    bayer_rggb8 path demosaiced to BGR then converted to gray.
    """
    try:
        import cv2

        arr = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise ValueError("cv2.imdecode failed")
        if "bayer_rggb8" in fmt:
            bgr = cv2.cvtColor(img, cv2.COLOR_BayerBG2BGR)
            img = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        return img.astype(np.float32)
    except ImportError:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(data)).convert("L")
        return np.asarray(img, np.float32)


def decode_compressed_image(msg: dict) -> np.ndarray:
    """Decode a parsed sensor_msgs/CompressedImage dict (see io/rosbag.py).

    Plain JPEG takes the native C++ decoder when built (io/native_loader);
    Bayer-encoded frames need the demosaic path and stay on OpenCV.
    """
    fmt = msg.get("format", "")
    if "bayer" not in fmt:
        from vision_slam_frontend_tpu.io import native_loader

        if native_loader.native_available():
            out = native_loader.decode_jpeg_gray(msg["data"])
            if out is not None:
                return out.astype(np.float32)
    return decode_image_bytes(msg["data"], fmt)


def encode_jpeg(image: np.ndarray, quality: int = 92) -> bytes:
    """Grayscale image -> JPEG bytes (for synthesizing test bags)."""
    img8 = np.clip(np.asarray(image), 0, 255).astype(np.uint8)
    try:
        import cv2

        ok, buf = cv2.imencode(".jpg", img8, [cv2.IMWRITE_JPEG_QUALITY, quality])
        if not ok:
            raise ValueError("cv2.imencode failed")
        return bytes(buf.tobytes())
    except ImportError:
        import io

        from PIL import Image

        out = io.BytesIO()
        Image.fromarray(img8).save(out, format="JPEG", quality=quality)
        return out.getvalue()
