"""Device-trace hotspot tool: capture one jitted dispatch, rank XLA op time.

The ONLY trustworthy perf instrument on this relay is the XLA device trace
(BASELINE.md r3 journey: host-side timing and scan microbenchmarks mislead
by 5-20x). This tool packages the r3 workflow: run one warm whole-model
dispatch under ``jax.profiler.trace``, parse the xplane protobuf, and
print the top op classes by accumulated device time.

  python tools/trace_top.py --model sdxl --batch 8 [--decode] [--int8]
  python tools/trace_top.py --parse /tmp/jax-trace-dir   # existing trace

Op names collapse to "<fusion-class> <out-shape>" so repeated layers
aggregate; the residual long tail prints as one line.
"""

import argparse
import glob
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# pure-python protobuf avoids the C++ descriptor-pool version trap
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
# persistent compile cache (same path as bench.py / ab_forward.py)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/flash_tpu_jax_cache")


def parse_trace(trace_dir: str, top: int = 30):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # older tensorflow layouts
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(max(paths, key=os.path.getmtime), "rb").read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise SystemExit(
            f"no TPU device plane in trace (planes: {[p.name for p in xs.planes]})"
        )
    plane = planes[0]
    lines = [l for l in plane.lines if l.name == "XLA Ops"]
    if not lines:
        raise SystemExit(f"no 'XLA Ops' line (lines: {[l.name for l in plane.lines]})")
    meta = plane.event_metadata
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in lines[0].events:
        name = meta[ev.metadata_id].name
        m = re.match(r"%([a-z_\-]+)[\.\d]* = \(?(\w+\[[\d,]*\])", name)
        key = f"{m.group(1)} {m.group(2)}" if m else name[:40]
        # control-flow wrappers (while/conditional/call) envelop their body
        # ops, which appear on the same line — counting both double-counts
        if key.split(" ")[0] in ("while", "conditional", "call"):
            continue
        tot[key] += ev.duration_ps / 1e12
        cnt[key] += 1
        total += ev.duration_ps / 1e12
    print(f"TOTAL device time {total * 1000:.2f} ms")
    shown = 0.0
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v * 1000:9.3f} ms  {100 * v / total:5.1f}%  n={cnt[k]:4d}  {k}")
        shown += v
    rest = total - shown
    if rest > 0:
        print(f"{rest * 1000:9.3f} ms  {100 * rest / total:5.1f}%  (long tail)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parse", default=None, help="parse an existing trace dir and exit")
    ap.add_argument("--model", default="sdxl", choices=["sdxl", "sd15", "pixart", "sd3"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--decode-chunk", type=int, default=1, help="images per decode call")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None, help="trace dir (default: temp)")
    args = ap.parse_args()

    if args.parse:
        parse_trace(args.parse, args.top)
        return

    import jax
    import jax.numpy as jnp

    sys.argv = ["bench.py"]
    from bench import build

    net, up, vae, vp, latents, cond, res = build(args.model, args.batch)
    if args.int8:
        from flash_diffusion_tpu.quant import quantize_dense

        up, _ = quantize_dense(up)

    if args.decode:
        c = max(1, min(args.decode_chunk, args.batch))
        while args.batch % c:
            c -= 1

        @jax.jit
        def fwd(vp, z):
            chunks = z.reshape(args.batch // c, c, *z.shape[1:])
            dec = jax.lax.map(
                lambda zc: vae.apply(vp, zc, method="decode_latents"), chunks
            )
            return dec.reshape(args.batch, *dec.shape[2:])

        call_args = (vp, latents.astype(jnp.bfloat16))
    else:
        @jax.jit
        def fwd(up, z):
            t = jnp.full((z.shape[0],), 500.0, jnp.float32)
            return net.apply(up, z.astype(jnp.bfloat16), t, cond)

        call_args = (up, latents)

    out = fwd(*call_args)
    _ = float(jnp.asarray(out).mean())  # compile + warm
    trace_dir = args.out or tempfile.mkdtemp(prefix="trace_top_")
    with jax.profiler.trace(trace_dir):
        out = fwd(*call_args)
        _ = float(jnp.asarray(out).mean())
    time.sleep(1.0)  # let the profiler flush
    print(f"trace: {trace_dir}")
    parse_trace(trace_dir, args.top)


if __name__ == "__main__":
    main()
