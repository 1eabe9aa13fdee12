"""bag_extract: dump a bag's compressed-image topic to numbered image files.

The TPU framework's version of the reference's standalone extraction tool
(reference: src/test/bag_extract.cc:38-95): same job — open a bag, iterate one
image topic, decode (incl. Bayer demosaic), write numbered .jpg files — using
the built-in pure-Python bag reader instead of rosbag/ROS.

Usage:
  python -m vision_slam_frontend_tpu.cli.bag_extract \
      --input in.bag --output_dir out/ [--image_topic /camera/...] [--max_images N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bag_extract", description=__doc__)
    p.add_argument("--input", required=True, help="input bag file")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--image_topic", default="/stereo/left/image_raw/compressed")
    p.add_argument("--max_images", type=int, default=0)
    args = p.parse_args(argv)

    from vision_slam_frontend_tpu.io import rosbag
    from vision_slam_frontend_tpu.io.image import decode_compressed_image, encode_jpeg

    os.makedirs(args.output_dir, exist_ok=True)
    count = 0
    for topic, t_ns, msg in rosbag.read_messages(args.input, topics=[args.image_topic]):
        if "data" not in msg:
            continue
        img = decode_compressed_image(msg)
        out = os.path.join(args.output_dir, f"{count:06d}.jpg")
        with open(out, "wb") as f:
            f.write(encode_jpeg(np.asarray(img)))
        count += 1
        if args.max_images and count >= args.max_images:
            break
    print(f"Extracted {count} images from {args.image_topic} to {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
