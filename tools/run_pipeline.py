"""Full 5-step UemDA pipeline driver.

Rebuild of ``runs/uemda/run_2vaihingen.sh:3-27`` as one orchestrated CLI
(the reference chains 5 OS processes glued by .pth files):

  1. train_src      --align-domain 1
  2. init_prototypes --stage 1
  3. train_align_uem --align-domain 1 --refine-label 1
  4. init_prototypes --stage 2
  5. train_ssl_uem   --gen 1 --refine-label 1 --lt uvem

Each step here is a subprocess too (clean XLA state per stage), but the
checkpoints are msgpack and all stage flags are derived from one config.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))


def run(cmd, dry):
    print("+", " ".join(cmd), flush=True)
    if not dry:
        subprocess.run(cmd, check=True)


from uemda_tpu.utils.log import str2bool
from uemda_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

def main():
    parser = argparse.ArgumentParser(description="Run the 3-stage pipeline.")
    parser.add_argument("--config-path", type=str, default="2vaihingen")
    parser.add_argument("--steps", type=str, default="1,2,3,4,5",
                        help="comma-separated subset of pipeline steps")
    parser.add_argument("--stage-steps", type=int, default=None,
                        help="override steps for every training stage (smoke runs)")
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--method", type=str, default="uemda",
                        choices=["uemda", "proca"],
                        help="uemda = reference runs/uemda chain (align_uem + "
                        "ssl_uem/uvem + refine); proca = runs/proca baseline "
                        "chain (no domain align, train_align + plain ssl/CE)")
    parser.add_argument("--gen-fastpath", type=str2bool, default=0,
                        help="stage 5: run the pseudo-label sweep on the "
                        "folded serving fast path")
    parser.add_argument("--resume", type=str, default="",
                        help="forwarded to the training stages ('auto' "
                             "continues each stage from its state_curr)")
    parser.add_argument("--gate", type=str2bool, default=0,
                        help="after the final stage, run the serving-mode "
                             "quality gate (tools/serving_gate.py) on every "
                             "stage-best checkpoint; nonzero exit if any "
                             "serving mode drifts past tolerance — a deploy "
                             "can't silently ship a degraded quantized path")
    parser.add_argument("--gate-tolerance", type=float, default=0.005)
    parser.add_argument("--gate-class-tolerance", type=float, default=0.02)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    from uemda_tpu.config import load_config

    cfg = load_config(args.config_path)
    log = cfg.snapshot_dir
    tset = cfg.target_set
    py = [sys.executable]
    sel = set(int(s) for s in args.steps.split(","))
    ov = (["--steps", str(args.stage_steps)] if args.stage_steps else [])
    if args.resume:
        ov = ov + ["--resume", args.resume]
    nd = (
        ["--num-devices", str(args.num_devices)] if args.num_devices else []
    )

    proca = args.method == "proca"
    if 1 in sel:
        # proca (runs/proca/*.sh): no CORAL domain alignment in stage 1
        run(py + [f"{TOOLS}/train_src.py", "--config-path", args.config_path,
                  "--align-domain", "0" if proca else "1"]
            + (["--pretrained", args.pretrained] if args.pretrained else [])
            + ov + nd, args.dry_run)
    if 2 in sel:
        run(py + [f"{TOOLS}/init_prototypes.py", "--config-path", args.config_path,
                  "--stage", "1",
                  "--ckpt-model", f"{log}/src/{tset}_best.msgpack",
                  "--ckpt-proto", f"{log}/src/prototypes_init.msgpack"],
            args.dry_run)
    if 3 in sel:
        if proca:
            run(py + [f"{TOOLS}/train_align.py", "--config-path",
                      args.config_path,
                      "--ckpt-model", f"{log}/src/{tset}_best.msgpack",
                      "--ckpt-proto", f"{log}/src/prototypes_init.msgpack"]
                + ov + nd, args.dry_run)
        else:
            run(py + [f"{TOOLS}/train_align_uem.py", "--config-path",
                      args.config_path,
                      "--align-domain", "1", "--refine-label", "1",
                      "--ckpt-model", f"{log}/src/{tset}_best.msgpack",
                      "--ckpt-proto", f"{log}/src/prototypes_init.msgpack"]
                + ov + nd, args.dry_run)
    if 4 in sel:
        run(py + [f"{TOOLS}/init_prototypes.py", "--config-path", args.config_path,
                  "--stage", "2",
                  "--ckpt-model", f"{log}/align/{tset}_best.msgpack",
                  "--ckpt-proto", f"{log}/align/prototypes_init.msgpack"],
            args.dry_run)
    if 5 in sel:
        # proca: refinement must be explicitly OFF (train_ssl_uem defaults
        # --refine-label to 1; the reference baseline runs without it)
        ssl_flags = (
            ["--gen", "1", "--refine-label", "0", "--lt", "ce"] if proca
            else ["--gen", "1", "--refine-label", "1", "--lt", "uvem"]
        )
        if args.gen_fastpath:
            ssl_flags += ["--gen-fastpath", "1"]
        run(py + [f"{TOOLS}/train_ssl_uem.py", "--config-path", args.config_path]
            + ssl_flags
            + ["--ckpt-model", f"{log}/align/{tset}_best.msgpack",
               "--ckpt-proto", f"{log}/align/prototypes_init.msgpack"]
            + ov + nd, args.dry_run)
    if args.gate:
        # gate across every stage-best checkpoint that exists — the int8
        # error is distribution-dependent, one checkpoint is not evidence
        candidates = (
            f"{log}/src/{tset}_best.msgpack",
            f"{log}/align/{tset}_best.msgpack",
            f"{log}/ssl/{tset}_best.msgpack",
        )
        ckpts = (
            list(candidates) if args.dry_run
            else [p for p in candidates if os.path.exists(p)]
        )
        if not ckpts:
            raise SystemExit("--gate: no stage-best checkpoints found under "
                             f"{log}")
        run(py + [f"{TOOLS}/serving_gate.py", "--config-path",
                  args.config_path, "--ckpt-path", ",".join(ckpts),
                  "--tolerance", str(args.gate_tolerance),
                  "--class-tolerance", str(args.gate_class_tolerance)],
            args.dry_run)

    if not args.dry_run:
        _warn_on_stage_regression(log)


def _warn_on_stage_regression(log: str, tol: float = 0.02):
    """Quality-regression check (VERDICT r3 item 2): each stage of the
    chain exists to improve on its predecessor (run_2vaihingen.sh:3-27's
    whole point); a later stage ending BELOW the stage it initialized from
    is the r3 LoveDA collapse signature (0.445 -> 0.108) and deserves a
    loud warning even when every step exited 0."""
    import json

    chain = ["src", "align", "ssl"]  # both method chains use these dirs
    best = {}
    for stage in chain:
        path = os.path.join(log, stage, "best.json")
        if os.path.isfile(path):
            with open(path) as f:
                row = json.load(f)
            if row.get("miou") is not None:
                best[stage] = float(row["miou"])
    for prev, cur in zip(chain, chain[1:]):
        if prev in best and cur in best and best[cur] < best[prev] - tol:
            print(
                f"WARNING: stage '{cur}' best mIoU {best[cur]:.4f} is below "
                f"its init stage '{prev}' ({best[prev]:.4f} - tol {tol}) — "
                "quality regression; check the target pipeline (see "
                "tests/test_quality_gate.py for the r3 collapse mechanism)",
                flush=True,
            )


if __name__ == "__main__":
    main()
