"""Export params-only serving checkpoints into git-tracked artifacts/.

The dev box wipes checkpoints/ on VM reboots (it is gitignored scratch);
a full-canvas GLN train costs ~90 min of gated TPU time to regenerate.
This exports the inference collections (pipeline/serving.py) — ~1/3 of
the train-state bytes — into artifacts/, which IS committed, so trained
weights survive the box and later sessions can run the e2e validation
directly against `--gln artifacts/gln_r3`.

Pure host-side job (orbax read/write, no TPU).

Run: python scripts/export_serving.py --kind gln \
       --run checkpoints/gln_r3 --out artifacts/gln_r3
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["gln", "dihe"], required=True)
    ap.add_argument("--run", required=True,
                    help="training-run directory (rotating checkpoint)")
    ap.add_argument("--out", required=True,
                    help="artifact directory to write (git-tracked)")
    ap.add_argument("--name", default=None,
                    help="checkpoint node inside --run to export "
                         "(default: the rotating final — 'checkpoint' "
                         "for gln, 'embedder_checkpoint' for dihe; pass "
                         "e.g. epoch_11 to export a BestKeeper node "
                         "when the final epoch is not the best)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side job

    from cvpce_tpu.pipeline.serving import (export_dihe_serving,
                                            export_gln_serving)

    kw = {"name": args.name} if args.name else {}
    if args.kind == "gln":
        out = export_gln_serving(args.run, args.out, **kw)
    else:
        out = export_dihe_serving(args.run, args.out, **kw)

    size = 0
    for root, _, files in os.walk(out):
        size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    print(json.dumps({"kind": args.kind, "out": out,
                      "bytes": size, "mb": round(size / 2**20, 1)}))


if __name__ == "__main__":
    main()
