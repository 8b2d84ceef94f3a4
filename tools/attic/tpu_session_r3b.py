#!/usr/bin/env python
"""Round-3 TPU measurement session B: reruns with the readback fixes
(scalar completion barriers — the first session's full-grid D2H through
the ~14 MB/s tunnel sat inside the timed regions), single-dispatch cycle
chains, and no k=20 layouts (Mosaic requires sublane-8-aligned VMEM slice
offsets; no such k divides stagger 100). Solves run first on a clean
device (session A's failed compiles left the backend RESOURCE_EXHAUSTED
for everything after them)."""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools import probe  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/probe_r3b.jsonl"
    sink = open(out_path, "a")

    import jax

    def emit(name, fn, **kw):
        t0 = time.perf_counter()
        try:
            res = fn(False, **kw)
            res = dict(exp=name, backend=jax.default_backend(),
                       wall_s=round(time.perf_counter() - t0, 1), **res)
        except Exception as e:
            res = dict(exp=name, backend=jax.default_backend(),
                       error=f"{type(e).__name__}: {e}")
        line = json.dumps(res)
        print(line, flush=True)
        sink.write(line + "\n")
        sink.flush()

    emit("biggrid-solve", probe.biggrid_solve,
         sizes=((2048, 30000, 16), (4096, 10000, 16), (8192, 4000, 16)))
    emit("tiled-solve", probe.tiled_solve, sizes=((16384, 16384, 2500, 16),))
    emit("biggrid-update", probe.biggrid_update,
         sizes=(2048, 4096, 8192, 16384))
    emit("tiled-update", probe.tiled_update,
         sizes=((16384, 16384), (32768, 16384)))
    emit("maze-chunk", probe.maze_chunk)
    emit("maze-solve", probe.maze_solve)
    emit("batched-solve", probe.batched_solve)
    emit("batched-map", probe.batched_map)
    emit("vol-update", probe.vol_update)
    emit("vol-solve", probe.vol_solve)
    emit("wideplane-update", probe.wideplane_update)
    emit("sharded-banded", probe.sharded_banded, size=4096, steps=512)
    sink.close()


if __name__ == "__main__":
    main()
