"""Parse a jax.profiler trace dir: per-step kernel counts + top ops.

The tensorboard plugin's own converters are version-broken in this image;
parse the xplane protos directly (BENCH.md "Measurement hygiene" recipe:
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python + tsl xplane_pb2). Works on
the axon virtualized device (plane "vm.xplane") and real TPUs.

    python tools/trace_kernels.py /tmp/trace_dir [--top 20]
"""
import argparse
import collections
import glob
import gzip
import os

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def load_xspace(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    p = sorted(paths)[-1]
    data = open(p, "rb").read()
    if p.endswith(".gz"):
        data = gzip.decompress(data)
    xs.ParseFromString(data)
    return xs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--plane", type=str, default=None,
                    help="substring filter for plane names (default: all "
                         "device-ish planes)")
    args = ap.parse_args()

    xs = load_xspace(args.trace_dir)
    for plane in xs.planes:
        if args.plane and args.plane not in plane.name:
            continue
        if not args.plane and not any(
            k in plane.name.lower() for k in ("tpu", "device", "vm", "gpu")
        ):
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        counts = collections.Counter()
        durs = collections.Counter()
        total_events = 0
        for line in plane.lines:
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, str(ev.metadata_id))
                counts[name] += 1
                durs[name] += ev.duration_ps
                total_events += 1
        print(f"=== plane: {plane.name}  lines={len(plane.lines)} "
              f"events={total_events} distinct_ops={len(counts)}")
        rows = sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]
        for name, ps in rows:
            print(f"  {ps/1e9:10.3f} ms  x{counts[name]:<6d} {name[:90]}")


if __name__ == "__main__":
    main()
