"""Headless visualization: PLY export, debug match images, HTML viewer."""
