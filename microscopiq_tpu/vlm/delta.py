"""Delta-checkpoint CLI — LLaVA ships its weights as deltas over a base
LM; these commands reproduce the reference's utilities on this repo's
checkpoint directories (``utils/checkpoint.py`` npz+JSON trees):

  python -m microscopiq_tpu.vlm.delta apply --base B --delta D --target T
      target = base + delta (``vlm/llava/model/apply_delta.py:1-48``):
      delta-only keys (mm_projector, vision tower) pass through; grown
      embed_tokens/lm_head rows add base into the leading slab.
  python -m microscopiq_tpu.vlm.delta make --base B --target T --delta D
      delta = target - base (``make_delta.py``).
  python -m microscopiq_tpu.vlm.delta consolidate --src S --dst D
      load + materialize to host numpy + save (``consolidate.py``) —
      normalizes any sharded/deviceful tree into one plain checkpoint.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_apply = sub.add_parser("apply")
    p_apply.add_argument("--base", required=True)
    p_apply.add_argument("--delta", required=True)
    p_apply.add_argument("--target", required=True)
    p_make = sub.add_parser("make")
    p_make.add_argument("--base", required=True)
    p_make.add_argument("--target", required=True)
    p_make.add_argument("--delta", required=True)
    p_con = sub.add_parser("consolidate")
    p_con.add_argument("--src", required=True)
    p_con.add_argument("--dst", required=True)
    args = ap.parse_args(argv)

    from ..utils.checkpoint import (apply_delta, consolidate,
                                    load_checkpoint, make_delta,
                                    save_checkpoint)

    if args.cmd == "apply":
        base = load_checkpoint(args.base)
        delta = load_checkpoint(args.delta)
        save_checkpoint(args.target, consolidate(apply_delta(base, delta)))
        print(f"wrote {args.target}")
    elif args.cmd == "make":
        base = load_checkpoint(args.base)
        target = load_checkpoint(args.target)
        save_checkpoint(args.delta, consolidate(make_delta(base, target)))
        print(f"wrote {args.delta}")
    else:
        save_checkpoint(args.dst,
                        consolidate(load_checkpoint(args.src)))
        print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
