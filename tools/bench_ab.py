"""A/B bench harness: time configs against an arbitrary checkout.

Usage: python tools/bench_ab.py <repo_root> [cbox] [veach] [volpath]

Imports gdpt_tpu from <repo_root> (e.g. a git worktree of an older
commit) and times the requested configs on the current chip. This
separates "the chip is slower today" from "the code regressed":
run it once against HEAD and once against the old snapshot,
back-to-back on the same day.
"""

import os
import sys
import time

root = os.path.abspath(sys.argv[1])
sys.path.insert(0, root)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
want = set(sys.argv[2:]) or {"cbox", "veach"}

from gdpt_tpu.integrators import path_soa, volpath_soa  # noqa: E402
from gdpt_tpu.scene import parser, presets  # noqa: E402

SCENES = os.environ.get("GDPT_SCENES", "/root/reference/scenes")


def timeit(name, fn):
    fn()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, nrays = fn()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name} @ {root}: {nrays/best/1e6:.2f} Mrays/s best "
          f"(walls {['%.3f' % t for t in times]}, {nrays} rays)", flush=True)


if "cbox" in want:
    sc = presets.cornell_box(width=512, height=512, spp=256, max_depth=6)
    timeit("cbox", lambda: path_soa.render_soa(
        sc, spp=256, seed=0, return_stats=True))
if "veach" in want:
    sc, _ = parser.parse_scene(f"{SCENES}/veach_mi/mi.xml")
    timeit("veach", lambda: path_soa.render_soa(
        sc, spp=64, seed=0, return_stats=True))
if "volpath" in want:
    sc, _ = parser.parse_scene(f"{SCENES}/volpath_test/volpath_test6.xml")
    timeit("volpath", lambda: volpath_soa.render_volpath_soa(
        sc, spp=16, seed=0, return_stats=True))
