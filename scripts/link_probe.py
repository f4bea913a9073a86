"""Measure the host<->device link and decompose end-to-end frame time.

The bench's `upload_ms` (~33 ms) is NOT bandwidth: the tracker pre-strides
frames on the host before upload (1.8 MB -> ~0.2 MB at stride 3,
tracking_fused.py), so per-frame synchronous dispatch cost is dominated by
the remote-TPU tunnel's round-trip latency.  The reference never pays this:
its camera, host, and GPU share one machine (live-demo.cpp grabs frames
in-process).  This script makes the claim checkable:

  - RTT: round-trip of a minimal transfer (device_put + block + tiny get),
    min over many reps (min isolates the latency floor from contention)
  - bandwidth: large-array device_put, bytes / (t - RTT)
  - frame bytes: the tracker's actual pre-strided uint16 frame
  - transfer_ms: frame bytes at measured bandwidth (the part that survives
    co-location); residual = upload_ms - transfer_ms, attributed to RTT
  - projected co-located e2e fps: 1000 / (device_ms + transfer_ms) for the
    synchronous path and 1000 / max(device_ms, transfer_ms) for the
    overlapped (track_async) path

Writes data/link_breakdown.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", default="data/link_breakdown.json")
    ap.add_argument("--bench-json", default="data/bench_latest_forest.json")
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--mb", type=int, default=32,
                    help="size of the bandwidth-probe array in MiB")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[link] device: {dev}")

    # --- RTT: minimal upload + ack, minimal download -----------------------
    tiny = np.zeros(8, np.float32)
    for _ in range(5):  # warm the dispatch path
        jax.device_put(tiny, dev).block_until_ready()
    up = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        jax.device_put(tiny, dev).block_until_ready()
        up.append(time.perf_counter() - t0)
    buf = jax.device_put(tiny, dev)
    buf.block_until_ready()
    down = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(buf)
        down.append(time.perf_counter() - t0)
    rtt_up = float(np.min(up) * 1e3)
    rtt_down = float(np.min(down) * 1e3)
    print(f"[link] RTT: upload {rtt_up:.2f} ms (median "
          f"{np.median(up)*1e3:.2f}), download {rtt_down:.2f} ms")

    # --- bandwidth: large upload minus the RTT floor ------------------------
    big = np.random.default_rng(0).integers(
        0, 5000, (args.mb << 20) // 2, np.uint16)
    jax.device_put(big, dev).block_until_ready()  # warm
    bw_ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_put(big, dev).block_until_ready()
        bw_ts.append(time.perf_counter() - t0)
    t_big = float(np.min(bw_ts))
    bw_mbps = big.nbytes / max(t_big - np.min(up), 1e-6) / 1e6
    print(f"[link] bandwidth: {bw_mbps:.0f} MB/s "
          f"({big.nbytes/1e6:.0f} MB in {t_big*1e3:.1f} ms)")

    # --- per-frame bytes + device time from the latest verified bench -------
    bench = {}
    if os.path.exists(args.bench_json):
        with open(args.bench_json) as f:
            bench = json.load(f)
    H, W, stride = 720, 1280, 3  # bench camera + TrackerConfig.rtree_interval
    frame_bytes = ((H + stride - 1) // stride) * \
        ((W + stride - 1) // stride) * 2  # pre-strided uint16 mm
    transfer_ms = frame_bytes / (bw_mbps * 1e6) * 1e3
    device_ms = bench.get("device_ms")
    upload_ms = bench.get("upload_ms")
    out = {
        "rtt_upload_ms": round(rtt_up, 3),
        "rtt_download_ms": round(rtt_down, 3),
        "bandwidth_MBps": round(bw_mbps, 1),
        "frame_bytes": frame_bytes,
        "transfer_ms": round(transfer_ms, 3),
        "device_ms": device_ms,
        "bench_upload_ms": upload_ms,
    }
    if upload_ms is not None:
        out["residual_rtt_ms"] = round(upload_ms - transfer_ms, 3)
    if device_ms is not None:
        out["colocated_sync_fps"] = round(
            1e3 / (device_ms + transfer_ms), 1)
        out["colocated_async_fps"] = round(
            1e3 / max(device_ms, transfer_ms), 1)
    print(json.dumps(out))
    os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
