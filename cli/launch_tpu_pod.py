"""Multi-host TPU pod launcher with auto-resume.

Replaces the reference's submitit/SLURM launchers
(run_with_submitit_*.py): instead of SLURM job arrays + NCCL rendezvous
via a shared-FS init file, hosts bootstrap with
``jax.distributed.initialize`` (coordinator address from flags or the
TPU metadata env) and the training scripts' auto-resume contract
(checkpoint in --output-dir wins) provides the same requeue-on-preemption
semantics: just re-run the same command.

Usage (each host):
  python -m cli.launch_tpu_pod --coordinator 10.0.0.2:8476 \
      --num-processes 4 --process-id $WORKER_ID \
      pretrain --dataset ego4d ...
Single-host multi-chip needs no flags: jax discovers local devices.
"""

from __future__ import annotations

import argparse
import sys

import jax


ENTRY_POINTS = {
    "pretrain": "cli.main_pretrain",
    "finetune_retrieval": "cli.main_finetune_retrieval",
    "finetune_classification": "cli.main_finetune_classification",
    "infer_narrator": "cli.main_infer_narrator",
    "eval_zeroshot": "cli.eval_zeroshot",
    "eval_narrator": "cli.eval_narrator",
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser("TPU pod launcher")
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (omit on single host "
                        "or under TPU metadata auto-discovery)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("entry", choices=sorted(ENTRY_POINTS))
    args, rest = parser.parse_known_args(argv)

    if args.coordinator or args.num_processes:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id)
        print(f"=> jax.distributed: process {jax.process_index()} / "
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
        from lavila_tpu.utils.logging import setup_for_distributed
        setup_for_distributed(jax.process_index() == 0)

    import importlib
    mod = importlib.import_module(ENTRY_POINTS[args.entry])
    if hasattr(mod, "get_args_parser"):
        sub_args = mod.get_args_parser().parse_args(rest)
    else:
        from lavila_tpu.config import PretrainConfig, parse_config
        sub_args = parse_config(PretrainConfig, rest)
    return mod.main(sub_args)


if __name__ == "__main__":
    main()
