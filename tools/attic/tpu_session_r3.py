#!/usr/bin/env python
"""Round-3 TPU measurement session: the full probe battery at production
shapes plus the solve chunk-depth A/B (VERDICT r2 #5 — the 8192² solve
ran 35.8 G vs the 43.8 G update chain; hypothesis: the k=16 layout pays a
4-sweep remainder chunk (full-grid HBM round trip) per 100-sweep cycle,
which k=20 (5 exact chunks) eliminates at +4% compute redundancy).

One process (remote-compile warmup amortized), JSONL appended to --out.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools import probe  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/probe_r3.jsonl"
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

    emit("maze-chunk", probe.maze_chunk)
    emit("maze-solve", probe.maze_solve)
    emit("biggrid-update", probe.biggrid_update,
         sizes=(2048, 4096, 8192, 16384))
    emit("biggrid-solve", probe.biggrid_solve,
         sizes=((2048, 30000, 16), (4096, 10000, 16), (8192, 4000, 16)))
    # chunk-depth A/B: k=20 divides stagger 100 exactly (no remainder chunk)
    emit("biggrid-solve-k20", probe.biggrid_solve,
         sizes=((4096, 10000, 20), (8192, 4000, 20), (2048, 30000, 20)))
    emit("tiled-update", probe.tiled_update,
         sizes=((16384, 16384), (32768, 16384)))
    emit("tiled-solve", probe.tiled_solve,
         sizes=((16384, 16384, 2500, 16),))
    emit("tiled-solve-k20", probe.tiled_solve,
         sizes=((16384, 16384, 2500, 20),))
    emit("batched-solve", probe.batched_solve)
    emit("batched-map", probe.batched_map)
    emit("vol-update", probe.vol_update)
    emit("vol-solve", probe.vol_solve)
    emit("wideplane-update", probe.wideplane_update)
    emit("sharded-banded", probe.sharded_banded, size=4096, steps=512)
    sink.close()


if __name__ == "__main__":
    main()
