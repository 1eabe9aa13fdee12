"""slam_frontend CLI: process a dataset through the frontend, save the problem.

The TPU-native equivalent of the reference driver binary
(reference: src/slam_frontend_main.cc): same flag surface
(--input/--output/--visualize/--save_debug/--odom_topic/--left_image_topic/
--right_image_topic/--max_poses/-v) plus dataset-format selection (rosbag
without a ROS install, KITTI, EuRoC, the synthetic fixture), npz + optional
PLY outputs, and the reference's end-of-run summary line.

Usage:
  python -m vision_slam_frontend_tpu.cli.slam_frontend \
      --input path/to.bag --output /tmp/problem.npz [--ply /tmp/map.ply]
  python -m vision_slam_frontend_tpu.cli.slam_frontend \
      --input synthetic:20 --output /tmp/problem.npz
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Iterator, Tuple

import numpy as np

Event = Tuple[str, float, tuple]  # (kind, timestamp, payload)


def iter_synthetic(spec: str) -> Iterator[Event]:
    """`synthetic[:N[:step]]` — the checked-in synthetic stereo world."""
    from vision_slam_frontend_tpu.io.synthetic import SyntheticRig, generate_sequence

    parts = spec.split(":")
    n = int(parts[1]) if len(parts) > 1 else 20
    step = float(parts[2]) if len(parts) > 2 else 0.25
    rig = SyntheticRig()
    for f in generate_sequence(num_frames=n, step=step, rig=rig):
        yield ("odometry", f.timestamp, (f.odom_translation, f.odom_rotation))
        yield ("stereo", f.timestamp, (f.left, f.right))


def _bag_messages(path: str, topics, verbosity: int):
    """Parsed bag messages via the native C++ scanner when built (indexes the
    whole bag up front, decodes JPEG on the native thread pool), else the
    pure-Python reader."""
    import os

    from vision_slam_frontend_tpu.io import native_loader, rosbag

    if os.environ.get("VSF_DISABLE_NATIVE") != "1" and native_loader.native_available():
        try:
            reader = native_loader.NativeBagReader(path)
        except (ValueError, RuntimeError):
            reader = None
        if reader is not None and len(reader) > 0:
            if verbosity > 0:
                print(f"[native] C++ bag scanner: {len(reader)} records")
            type_by_topic = {t: ty for t, ty in reader.connections.values()}
            for topic, t_ns, raw in reader.read_messages(topics=list(topics)):
                parser = rosbag.DESERIALIZERS.get(type_by_topic.get(topic, ""))
                msg = parser(raw) if parser else {"raw": raw}
                yield topic, t_ns, msg
            return
    yield from rosbag.read_messages(path, topics=list(topics))


def iter_bag(path: str, left_topic: str, right_topic: str, odom_topic: str, verbosity: int) -> Iterator[Event]:
    """ROS1 bag streaming (native C++ scanner when built; no ROS install)."""
    from vision_slam_frontend_tpu.io.image import decode_compressed_image

    pending_left = None  # (t_ns, image_msg)
    for topic, t_ns, msg in _bag_messages(
        path, [left_topic, right_topic, odom_topic], verbosity
    ):
        if topic == odom_topic:
            if verbosity > 1:
                print(f"Odometry t={t_ns * 1e-9:.6f}")
            yield ("odometry", t_ns * 1e-9, (msg["position"], msg["orientation_wxyz"]))
        elif topic == left_topic:
            pending_left = (msg["stamp_ns"], msg)
        elif topic == right_topic:
            # Pair strictly by equal timestamps, like the reference's CHECK
            # (src/slam_frontend_main.cc:290-291) but tolerant: skip unpaired.
            if pending_left is None or pending_left[0] != msg["stamp_ns"]:
                continue
            t = msg["stamp_ns"] * 1e-9
            if verbosity > 1:
                print(f"CompressedImage t={t:.6f}")
            left = decode_compressed_image(pending_left[1])
            right = decode_compressed_image(msg)
            pending_left = None
            yield ("stereo", t, (left, right))


def iter_kitti(path: str, sequence: str | None) -> Iterator[Event]:
    from vision_slam_frontend_tpu.io.kitti import iter_kitti_events

    yield from iter_kitti_events(path, sequence)


def iter_euroc(path: str) -> Iterator[Event]:
    from vision_slam_frontend_tpu.io.euroc import iter_euroc_events

    yield from iter_euroc_events(path)


def prefetch_events(
    events: Iterator[Event], depth: int = 16, to_device: bool = True
) -> Iterator[Event]:
    """Decode-ahead pipeline: run the event source (bag read + JPEG decode)
    on a producer thread feeding a bounded queue.

    The device keyframe step is dispatched asynchronously (the frontend's
    1-deep result pipeline), so with a synchronous source the host sits in
    JPEG decode while the TPU idles between dispatches. The native decoder
    and file reads release the GIL, so one producer thread overlaps the
    whole IO path with device compute — the TPU-side equivalent of the
    reference's single-threaded ProcessBagfile loop
    (src/slam_frontend_main.cc:271-328) but without its decode stall.

    With `to_device`, the producer also issues the host->device image
    uploads (as uint8, the wire format the keyframe step expects), so the
    transfer queues ahead of the main loop's dispatch instead of on its
    critical path — the dominant per-frame cost when the device link is
    slow (BASELINE.md: the K=512 step is 2.9 ms on-chip; the 640x480 pair's
    upload is ~8 ms through this environment's tunnel).
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    DONE = object()
    # Consumer-abandonment protocol: if the consumer stops early (SIGINT
    # break, --max_poses, generator close), it sets `stop` from the finally
    # below; the producer's bounded put polls it so the thread exits instead
    # of blocking forever on a full queue (leaking decoded frames + queued
    # device buffers in embedded/library use).
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            import jax
            import numpy as _np

            for kind, t, payload in events:
                if stop.is_set():
                    return
                if to_device and kind == "stereo":
                    l, r = payload
                    # ONE stacked (2, H, W) upload instead of two: each
                    # host->device transfer pays a link RTT on this rig; the
                    # on-device slices below are tiny async device programs.
                    pair = jax.device_put(_np.stack([
                        _np.clip(_np.asarray(l), 0, 255).astype(_np.uint8),
                        _np.clip(_np.asarray(r), 0, 255).astype(_np.uint8),
                    ]))
                    payload = (pair[0], pair[1])
                if not _put((kind, t, payload)):
                    return
            _put(DONE)
        except BaseException as e:  # propagate into the consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True, name="vsf-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is DONE:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def detect_dataset(input_spec: str) -> str:
    import os

    if input_spec.startswith("synthetic"):
        return "synthetic"
    if input_spec.endswith(".bag"):
        return "bag"
    if os.path.isdir(input_spec):
        if os.path.isdir(os.path.join(input_spec, "mav0")):
            return "euroc"
        if os.path.isdir(os.path.join(input_spec, "image_0")) or os.path.isdir(
            os.path.join(input_spec, "image_00")
        ):
            return "kitti"
    raise ValueError(f"Cannot auto-detect dataset type of {input_spec!r}; pass --dataset")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="slam_frontend", description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    # Reference flag surface (src/slam_frontend_main.cc:81-96).
    p.add_argument("--input", required=True, help="bag file / dataset dir / synthetic[:N]")
    p.add_argument("--output", required=True, help="output SLAM problem (.npz)")
    p.add_argument(
        "--visualize", action="store_true",
        help="live visualization: rewrite <output>_live.html per keyframe "
        "(auto-refreshing pose-graph/landmark viewer — open it in a browser "
        "and watch the map grow; headless RViz equivalent)",
    )
    p.add_argument(
        "--visualize_every", type=int, default=1,
        help="rewrite the live viewer every N keyframes (with --visualize)",
    )
    p.add_argument(
        "--save_debug", action="store_true",
        help="stream per-keyframe debug match/stereo images to "
        "<output>_debug/ as they are produced (memory stays flat)",
    )
    p.add_argument("--left_image_topic", default="/stereo/left/image_raw/compressed")
    p.add_argument("--right_image_topic", default="/stereo/right/image_raw/compressed")
    p.add_argument("--odom_topic", default="/odometry/filtered")
    p.add_argument("--max_poses", type=int, default=0, help="stop after this many SLAM poses (0 = all)")
    p.add_argument("-v", "--verbosity", type=int, default=0)
    # Framework extensions.
    p.add_argument("--dataset", choices=["auto", "bag", "kitti", "euroc", "synthetic"], default="auto")
    p.add_argument("--sequence", default=None, help="KITTI sequence id (e.g. 00)")
    p.add_argument("--config", default=None, help="YAML config/calibration path")
    p.add_argument("--ply", default=None, help="also export pose-graph + landmark PLY here")
    p.add_argument("--html", default=None, help="also export a standalone interactive HTML viewer")
    p.add_argument(
        "--output_bag", default=None,
        help="also write a reference-format ROS bag (extrinsics/intrinsics/slam_problem topics)",
    )
    p.add_argument("--max_features", type=int, default=None, help="override feature capacity K")
    p.add_argument("--frame_life", type=int, default=None, help="override temporal window W")
    p.add_argument(
        "--descriptor_family", default=None,
        help="descriptor family from the registry (orb, brisk, ...) — the "
        "reference's -descriptor_extract_type switch",
    )
    p.add_argument(
        "--local_ba", type=int, default=0,
        help="run windowed local bundle adjustment over the last N keyframes "
        "after each new keyframe (0 = off)",
    )
    p.add_argument(
        "--checkpoint_every", type=int, default=0,
        help="write a resumable snapshot every N keyframes (to <output>.ckpt.npz)",
    )
    p.add_argument("--resume", default=None, help="resume from a checkpoint file")
    p.add_argument(
        "--profile_dir", default=None,
        help="capture a jax.profiler trace of the run into this directory",
    )
    p.add_argument(
        "--validate", action="store_true",
        help="sanitizer mode: check per-keyframe invariants (NaN/bounds/indices)",
    )
    p.add_argument(
        "--no_prefetch", action="store_true",
        help="disable the decode-ahead thread (bag reads + JPEG decode "
        "overlap device compute by default)",
    )
    p.add_argument(
        "--interrupt_after", type=int, default=0, metavar="N",
        help="fault injection: raise SIGINT after N stereo frames "
        "(deterministic test of the graceful-interrupt path; 0 = off)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from vision_slam_frontend_tpu.frontend import Frontend, FrontendConfig
    from vision_slam_frontend_tpu.io.serialize import save_problem

    dataset = args.dataset if args.dataset != "auto" else detect_dataset(args.input)

    overrides = {}
    if args.max_features is not None:
        overrides["max_features"] = args.max_features
    if args.frame_life is not None:
        overrides["frame_life"] = args.frame_life
    if args.descriptor_family is not None:
        overrides["descriptor_family"] = args.descriptor_family
    if args.save_debug:
        overrides["debug_images"] = True
    if args.validate:
        overrides["validate"] = True
    if args.config:
        config = FrontendConfig.load(args.config)
        for k, v in overrides.items():
            setattr(config, k, v)
    elif dataset == "synthetic":
        from vision_slam_frontend_tpu.io.synthetic import SyntheticRig

        config = FrontendConfig(calib=SyntheticRig().calib(), fast_threshold=12.0, **overrides)
    elif dataset == "kitti":
        from vision_slam_frontend_tpu.io.kitti import kitti_calib

        config = FrontendConfig(calib=kitti_calib(args.input, args.sequence), **overrides)
    elif dataset == "euroc":
        from vision_slam_frontend_tpu.io.euroc import euroc_calib

        config = FrontendConfig(calib=euroc_calib(args.input), **overrides)
    else:
        config = FrontendConfig(**overrides)

    if dataset == "synthetic":
        events = iter_synthetic(args.input)
    elif dataset == "bag":
        events = iter_bag(
            args.input, args.left_image_topic, args.right_image_topic,
            args.odom_topic, args.verbosity,
        )
    elif dataset == "kitti":
        events = iter_kitti(args.input, args.sequence)
    else:
        events = iter_euroc(args.input)
    if dataset != "synthetic" and not args.no_prefetch:
        # Overlap bag reads + JPEG decode with device compute (decode-ahead
        # thread; the synthetic generator has no IO to hide).
        events = prefetch_events(events)

    frontend = Frontend(config)
    frontend.verbosity = args.verbosity

    import os as _os

    base = _os.path.splitext(args.output)[0]
    viewer = None
    if args.visualize:
        from vision_slam_frontend_tpu.viz.live import IncrementalLiveViewer

        viewer = IncrementalLiveViewer(
            base + "_live.html", config.left_cam_to_robot,
            every=args.visualize_every,
        )
        print(f"Live viewer: open {viewer.path} in a browser (auto-refreshes)")
    if args.save_debug:
        from vision_slam_frontend_tpu.viz.live import DebugImageStreamer

        frontend.debug_sink = DebugImageStreamer(base + "_debug")
    resume_t = -float("inf")
    if args.resume:
        resume_t = frontend.load_checkpoint(args.resume)
        print(
            f"Resumed from {args.resume}: {frontend.get_num_poses()} poses, "
            f"skipping events at t <= {resume_t:.6f}"
        )
    ckpt_path = args.output + ".ckpt.npz"
    last_ckpt_poses = n_poses = frontend.get_num_poses()

    profiler_ctx = None
    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
        profiler_ctx = args.profile_dir

    # Graceful interrupt (reference installs a SIGINT handler for clean exit,
    # src/slam_frontend_main.cc:417-420,436; here Ctrl-C additionally flushes
    # the pipeline and writes the partial problem + a resumable checkpoint,
    # so an interrupted run loses nothing). A second Ctrl-C aborts hard.
    import signal

    interrupted = {"flag": False}
    prev_sigint = None

    def _on_sigint(signum, frame):
        if interrupted["flag"]:
            signal.signal(signal.SIGINT, prev_sigint or signal.SIG_DFL)
            raise KeyboardInterrupt
        interrupted["flag"] = True
        print(
            "\n[signal] SIGINT: stopping after the current frame; writing "
            "partial problem + checkpoint (Ctrl-C again to abort hard)"
        )

    try:
        prev_sigint = signal.signal(signal.SIGINT, _on_sigint)
    except ValueError:  # not the main thread (embedded use): no handler
        prev_sigint = None

    print(f"Processing {args.input}")
    t_start = time.perf_counter()
    frames_seen = 0
    frame_lat: list = []  # per-stereo-frame host-loop latency samples
    ba_live = None  # the SLAMProblem snapshot owning the in-flight local BA

    def _drain_local_ba():
        # Apply any in-flight pipelined local-BA result (checkpoint /
        # interrupt / epilogue want current poses, not one-keyframe-stale).
        if args.local_ba > 0 and ba_live is not None:
            from vision_slam_frontend_tpu.backend.local_ba import flush_local_ba

            updated, _ = flush_local_ba()
            if updated:
                frontend.update_poses(ba_live.nodes)
    try:
        events = iter(events)
        first = next(events, None)
    except (FileNotFoundError, ValueError) as e:
        # Clean failure like the reference's bag-open error path
        # (src/slam_frontend_main.cc:241-243).
        print(f"Unable to read {args.input}, reason:\n {e}")
        return 1
    if first is None:
        print(f"Unable to read {args.input}, reason:\n no events found")
        return 1
    import itertools

    for kind, t, payload in itertools.chain([first], events):
        if interrupted["flag"]:
            break
        if t <= resume_t:
            continue
        if kind == "odometry":
            translation, rotation = payload
            frontend.observe_odometry(translation, rotation, t)
        else:
            left, right = payload
            frames_seen += 1
            t_frame = time.perf_counter()
            added = frontend.observe_image(left, right, t)
            if args.interrupt_after > 0 and frames_seen >= args.interrupt_after:
                signal.raise_signal(signal.SIGINT)
            # Count keyframes locally: get_num_poses flushes the frontend's
            # one-deep result pipeline, which would put the device->host fetch
            # back on the critical path every frame.
            if added:
                n_poses += 1
            if added and viewer is not None:
                # Per-keyframe live publishing (the reference's
                # PublishVisualization after every new pose,
                # src/slam_frontend_main.cc:319-327). Reads the materialized
                # accumulator (one keyframe behind) — no pipeline flush, and
                # the append is O(delta), not O(problem).
                viewer.update(frontend)
            if added and args.local_ba > 0 and n_poses >= 4:
                from vision_slam_frontend_tpu.backend.local_ba import (
                    flush_local_ba,
                    windowed_local_ba,
                )

                # Pipelined one keyframe deep: flush keyframe k-1's solve
                # (its device compute + result fetch overlapped this frame's
                # IO + keyframe step), push the refined poses back, THEN
                # build + dispatch this keyframe's window — identical math
                # to the synchronous schedule, minus the blocking wait.
                updated, ba_info = flush_local_ba()
                if updated and ba_live is not None:
                    frontend.update_poses(ba_live.nodes)
                    if args.verbosity > 1 and ba_info:
                        print(
                            f"[local-ba] refined {updated} poses "
                            f"(cost {ba_info['history'][0]:.1f} -> {ba_info['cost']:.1f})"
                        )
                ba_live = frontend.get_slam_problem()
                windowed_local_ba(
                    ba_live, config, window=args.local_ba, pipeline=True
                )
            if (
                args.checkpoint_every > 0
                and n_poses > last_ckpt_poses
                and n_poses % args.checkpoint_every == 0
            ):
                _drain_local_ba()
                frontend.save_checkpoint(ckpt_path)
                last_ckpt_poses = n_poses
                if args.verbosity > 0:
                    print(f"[checkpoint] {n_poses} poses -> {ckpt_path}")
            # Per-frame latency sample: everything a stereo frame costs on
            # the host loop (step dispatch + local BA + viewer + checkpoint),
            # for the long-run percentile report below.
            frame_lat.append(time.perf_counter() - t_frame)
            if args.max_poses > 0 and n_poses >= args.max_poses:
                break
    _drain_local_ba()
    elapsed = time.perf_counter() - t_start
    if prev_sigint is not None:
        signal.signal(signal.SIGINT, prev_sigint)
    if interrupted["flag"]:
        # Nothing is lost: a resumable snapshot regardless of
        # --checkpoint_every, then the normal epilogue writes the partial
        # problem and every requested artifact.
        frontend.save_checkpoint(ckpt_path)
        print(
            f"[signal] interrupted at {n_poses} keyframes: checkpoint -> "
            f"{ckpt_path} (resume with --resume {ckpt_path})"
        )
    if profiler_ctx:
        import jax

        jax.profiler.stop_trace()
        print(f"Wrote profiler trace to {profiler_ctx}")
    print("Done processing bag file." if dataset == "bag" else "Done processing input.")

    problem = frontend.get_slam_problem()
    save_problem(args.output, problem, config=config, node_track_ids=frontend.node_track_ids)
    # The reference's exact summary line (src/slam_frontend_main.cc:375-381).
    print(problem.summary())
    n_poses = frontend.get_num_poses()
    print(
        f"[perf] {frames_seen} stereo frames, {n_poses} keyframes in {elapsed:.2f}s "
        f"({frames_seen / max(elapsed, 1e-9):.1f} frames/s, "
        f"{n_poses / max(elapsed, 1e-9):.1f} keyframes/s)"
    )
    if frame_lat:
        # Long-run observability: latency percentiles over the whole run
        # (every stereo frame's host-loop cost, local BA / viewer /
        # checkpoint included) + peak RSS — the memory-stays-flat and
        # tail-latency evidence a production deployment watches.
        import resource

        lat = np.sort(np.asarray(frame_lat))
        p = lambda q: lat[min(int(q * len(lat)), len(lat) - 1)] * 1000
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(
            f"[perf] frame latency ms p50={p(0.50):.1f} p90={p(0.90):.1f} "
            f"p99={p(0.99):.1f} max={lat[-1] * 1000:.1f}; peak RSS {rss_mb:.0f} MB"
        )
    if args.verbosity > 0 and frontend.stats_summary():
        print(f"[stats] {frontend.stats_summary()}")

    if args.output_bag:
        from vision_slam_frontend_tpu.io.ros_msgs import write_output_bag

        write_output_bag(args.output_bag, problem, config)
        print(f"Wrote reference-format bag {args.output_bag}")

    if args.ply:
        from vision_slam_frontend_tpu.viz.ply import export_ply

        stats = export_ply(args.ply, problem, config.left_cam_to_robot)
        print(f"Wrote {args.ply}: {stats}")

    if args.html:
        from vision_slam_frontend_tpu.viz.html import export_html

        stats = export_html(args.html, problem, config.left_cam_to_robot)
        print(f"Wrote {args.html}: {stats}")

    if args.save_debug:
        sink = frontend.debug_sink
        print(
            f"Streamed {sink.num_match} match + {sink.num_stereo} stereo "
            f"debug images to {sink.directory}/"
        )
    if viewer is not None:
        # Final flush: `problem` above already flushed the pipeline, so the
        # accumulator is complete — append the last keyframe's delta.
        viewer.update(frontend, force=True)
        print(f"Live viewer final state: {viewer.path} ({viewer.last_stats})")
    return 130 if interrupted["flag"] else 0  # 130 = interrupted, by convention


if __name__ == "__main__":
    sys.exit(main())
