"""Command-line renderer.

Replaces reference: src/main.cpp:
  python -m gdpt_tpu [options] scene1.xml [scene2.xml ...]

Options:
  -o <file>    override the output filename from the scene file
  -t <n>       kept for lajolla CLI compatibility (thread count is
               meaningless here: XLA owns the device)
  --spp <n>    override samples per pixel
  --platform   jax platform override (tpu/cpu)
  --checkpoint-every <n>  write accumulator checkpoints every n spp
"""

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="gdpt_tpu")
    ap.add_argument("scenes", nargs="+", help="Mitsuba-dialect XML scene files")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("-t", "--threads", type=int, default=None,
                    help="ignored (kept for lajolla CLI compatibility)")
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--profile", default=None,
                    help="write a jax profiler trace to this directory")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from gdpt_tpu.core import image as gimage
    from gdpt_tpu.integrators import render as R
    from gdpt_tpu.scene import parser
    from gdpt_tpu.utils import profiling

    for scene_file in args.scenes:
        print(f"Parsing & constructing scene {scene_file}.")
        with profiling.timer() as t_parse:
            scene, out_name = parser.parse_scene(scene_file)
        print(f"Done. Took {t_parse():.5f} seconds.")
        out = args.output or out_name
        print("Rendering...")
        with profiling.timer() as t_render:
            if args.profile:
                import jax

                with jax.profiler.trace(args.profile):
                    img = R.render(scene, spp=args.spp, seed=args.seed)
            elif args.checkpoint_every:
                from gdpt_tpu.utils import checkpoint

                img = checkpoint.render_with_checkpoints(
                    scene, spp=args.spp, seed=args.seed,
                    every=args.checkpoint_every,
                    path=out + ".ckpt.npz",
                )
            else:
                img = R.render(scene, spp=args.spp, seed=args.seed)
        print(f"Done. Took {t_render():.5f} seconds.")
        gimage.imwrite(out, img)
        print(f"Wrote {out}.")


if __name__ == "__main__":
    main()
