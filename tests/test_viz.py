"""Viz tests: PLY structure, debug images, HTML viewer content."""

import json
import re

import numpy as np

from tests.test_io import make_problem
from vision_slam_frontend_tpu.viz.debug_images import (
    create_match_debug_image,
    create_stereo_debug_image,
)
from vision_slam_frontend_tpu.viz.html import export_html
from vision_slam_frontend_tpu.viz.ply import export_ply


def test_ply_structure(tmp_path):
    problem = make_problem()
    path = str(tmp_path / "map.ply")
    stats = export_ply(path, problem)
    assert stats["nodes"] == 3
    raw = open(path, "rb").read()
    header, _, body = raw.partition(b"end_header\n")
    assert b"element vertex" in header
    n_vertex = int(re.search(rb"element vertex (\d+)", header).group(1))
    n_edge = int(re.search(rb"element edge (\d+)", header).group(1))
    assert n_vertex == stats["nodes"] + stats["landmarks"]
    assert n_edge == stats["edges"] == 4  # 2 odom + 2 vision factors
    assert len(body) == n_vertex * (12 + 3) + n_edge * 8


def test_html_viewer(tmp_path):
    problem = make_problem()
    path = str(tmp_path / "map.html")
    stats = export_html(path, problem, title="test")
    html = open(path).read()
    assert html.startswith("<!DOCTYPE html>")
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html, re.S).group(1))
    assert len(data["nodes"]) == stats["nodes"] == 3
    assert len(data["odom_edges"]) == 2
    assert data["extent"] > 0
    # No unfilled template placeholders.
    assert "{data}" not in html and "{stats}" not in html


def test_debug_images_draw():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    lp = np.array([[20.0, 30.0], [40.0, 10.0]])
    rp = np.array([[18.0, 30.0], [37.0, 11.0]])
    stereo = create_stereo_debug_image(img, img, lp, rp)
    assert stereo.shape == (60, 160, 3)
    assert (stereo[:, :, 0] != stereo[:, :, 1]).any()  # something red drawn
    match = create_match_debug_image(img, lp, rp)
    assert match.shape == (60, 80, 3)
    # Green flow lines present.
    green = (match[:, :, 1] > 200) & (match[:, :, 0] < 60)
    assert green.any()
