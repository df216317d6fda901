"""Archive a trained checkpoint's PARAMS (not opt state) into the committed
``benchmarks/checkpoints/`` tree.

Motivation: every gitignored artifact tree (``trained_models/``,
``grid_search_results/``, ``data/``, ``results/``) is wiped when a build
round restarts, which has already cost two from-scratch retrains of
checkpoints that BENCHMARKS.md rows depend on (the DPS prior net and the
500k-epoch converged CDE).  A params-only snapshot of a 512x3 MLP is ~3 MB —
cheap to commit, and enough to re-run every eval-only experiment
(``tools/dps_guidance_sweep.py``, ``tools/refined_snf_parity.py``,
``gridsearch`` eval-only reuse) without retraining.

Usage:
    python tools/archive_checkpoint.py SRC_CKPT_DIR NAME --note "..."
    python tools/archive_checkpoint.py --restore NAME DEST_CKPT_DIR

``SRC_CKPT_DIR`` is a directory written by ``dmip_tpu.checkpoints``
(params.npz + params.treedef.json + manifest.json).  The archive keeps only
the params files and rewrites the manifest with provenance (source path,
step, note); ``--restore`` copies an archive back into a working checkpoint
directory where ``load_checkpoint`` (or gridsearch's eval-only reuse path)
picks it up.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARCHIVE = os.path.join(REPO, "benchmarks", "checkpoints")

PARAM_FILES = ("params.npz", "params.treedef.json")


def archive(src: str, name: str, note: str = "") -> str:
    dst = os.path.join(ARCHIVE, name)
    os.makedirs(dst, exist_ok=True)
    for fn in PARAM_FILES:
        src_fn = os.path.join(src, fn)
        if not os.path.exists(src_fn):
            raise FileNotFoundError(f"{src_fn} (not a dmip_tpu checkpoint dir?)")
        shutil.copy2(src_fn, os.path.join(dst, fn))
    manifest = {}
    src_manifest = os.path.join(src, "manifest.json")
    if os.path.exists(src_manifest):
        with open(src_manifest) as f:
            manifest = json.load(f)
    manifest.pop("has_opt_state", None)  # opt state deliberately not archived
    manifest.pop("has_key", None)
    # load_checkpoint requires manifest['step']; a source dir without a
    # manifest (hand-assembled params) would otherwise produce an archive
    # its documented consumer cannot read.
    manifest.setdefault("step", 0)
    manifest["archived_from"] = os.path.relpath(src, REPO)
    if note:
        manifest["note"] = note
    with open(os.path.join(dst, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return dst


def restore(name: str, dest: str) -> str:
    src = os.path.join(ARCHIVE, name)
    os.makedirs(dest, exist_ok=True)
    for fn in PARAM_FILES + ("manifest.json",):
        shutil.copy2(os.path.join(src, fn), os.path.join(dest, fn))
    return dest


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src", help="checkpoint dir to archive (or NAME with --restore)")
    p.add_argument("name", help="archive name (or DEST dir with --restore)")
    p.add_argument("--note", default="", help="provenance note for the manifest")
    p.add_argument("--restore", action="store_true",
                   help="copy benchmarks/checkpoints/SRC into NAME (a dest dir)")
    args = p.parse_args()
    if args.restore:
        out = restore(args.src, args.name)
        print(f"restored -> {out}")
    else:
        out = archive(args.src, args.name, args.note)
        size = sum(
            os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
        )
        print(f"archived -> {out} ({size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
