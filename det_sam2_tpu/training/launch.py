"""Multi-host training entry: jax.distributed + global-mesh data feeding.

TPU-native replacement for the reference's launcher
(/root/reference/training/train.py:28-123: argparse -> submitit SLURM or
local multiprocess, 1 process per GPU, NCCL rendezvous). On TPU pods the
runtime launches one process per host; `init_distributed()` wires them into
one JAX runtime (jax.distributed.initialize auto-detects coordinator/rank
on TPU pods and under SLURM), and the mesh spans all global devices. Each
process feeds only its local batch shard; `host_local_batch_to_global`
assembles the global sharded array (the jax analogue of the reference's
per-rank DistributedSampler + DDP all-reduce).

Single-process use (tests, one chip) works unchanged: initialize is
skipped, the "global" mesh is the local one.
"""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("det_sam2_tpu.launch")

# Exit code the Trainer raises after its SIGTERM checkpoint (SystemExit
# 143 in trainer.run); the supervisor treats it as "requeue me".
REQUEUE_EXIT_CODE = 143


def supervise(
    cmd: Sequence[str],
    max_requeues: int = 16,
    env: Optional[dict] = None,
) -> int:
    """Scheduler-agnostic requeue supervisor — the TPU-VM analogue of the
    reference's SubmititRunner (training/train.py:68-103), whose job is
    to RESUBMIT the training job after a preemption so the trainer
    resumes from its last checkpoint. On SLURM that is scontrol requeue;
    on TPU VMs / GKE a maintenance event lands as SIGTERM, the trainer
    checkpoints and exits REQUEUE_EXIT_CODE (trainer.py checkpoint_on_
    sigterm), and this loop relaunches the command — auto_resume picks up
    the checkpoint. Any other exit code (success or real failure) is
    final. Returns the final exit code.

    Signal handling: the preemption SIGTERM is usually delivered to THIS
    process (container PID 1 / systemd main pid), not the trainer child —
    and under process-group delivery it hits both, killing a naive
    supervisor before it can requeue. So the supervisor traps SIGTERM/
    SIGINT, forwards them to the child (whose checkpoint_on_sigterm
    handler then checkpoints and exits 143), and survives to relaunch."""
    import signal
    import subprocess

    requeues = 0
    while True:
        proc = subprocess.Popen(list(cmd), env=env)

        def _forward(signum, frame):
            try:
                proc.send_signal(signum)
            except (ProcessLookupError, OSError):
                pass

        prev = {
            s: signal.signal(s, _forward)
            for s in (signal.SIGTERM, signal.SIGINT)
        }
        try:
            rc = proc.wait()
        finally:
            for s, h in prev.items():
                signal.signal(s, h)
        if rc != REQUEUE_EXIT_CODE:
            return rc
        requeues += 1
        if requeues > max_requeues:
            logger.error(
                "requeue budget exhausted (%d); giving up", max_requeues
            )
            return rc
        logger.warning(
            "preemption exit (%d): requeue %d/%d",
            rc, requeues, max_requeues,
        )


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize the multi-process JAX runtime. Returns
    (process_index, process_count). No-ops when single-process and no
    coordinator is given (reference equivalent: train.py:28-123 +
    torch.distributed init in trainer)."""
    import jax

    if coordinator_address is None and num_processes is None:
        try:
            import jax.distributed as jd

            # auto-detection works on TPU pods and under SLURM; on a plain
            # single host it raises and we stay single-process
            jd.initialize()
        except Exception:
            pass
    else:
        import jax.distributed as jd

        jd.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_global_mesh(axis_name: str = "data"):
    """One data-parallel mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_local_batch_to_global(mesh, arrays, axis: int = 1):
    """Per-process local batch shards -> global jax.Arrays sharded over the
    mesh 'data' axis. Each process passes only ITS slice of the global
    batch (global batch = local batch * process_count)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_name = mesh.axis_names[0]

    def to_global(x):
        spec = [None] * np.ndim(x)
        spec[axis] = axis_name
        sharding = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(to_global, arrays)


class DistributedDataLoader:
    """Wraps a host loader so each process contributes its local shard of
    the global batch (reference: per-rank DistributedSampler)."""

    def __init__(self, loader, mesh):
        self.loader = loader
        self.mesh = mesh

    def batches(self, n: int):
        for images, gt in self.loader.batches(n):
            yield host_local_batch_to_global(self.mesh, (images, gt), axis=1)


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: mirrors the reference launcher's surface (train.py) with
    jax-native flags. The dataset root uses the MOSE/DAVIS layout."""
    # allow_abbrev=False: the supervisor relaunch strips the literal
    # "--supervise" token from child argv; an abbreviated form (--su 3)
    # would survive the strip and recurse into a supervisor chain.
    p = argparse.ArgumentParser(
        description="det_sam2_tpu multi-host trainer", allow_abbrev=False
    )
    p.add_argument("--img-folder", required=True)
    p.add_argument("--gt-folder", required=True)
    p.add_argument("--model", default="hiera_b+", choices=["hiera_t", "hiera_s", "hiera_b+", "hiera_l"])
    p.add_argument("--image-size", type=int, default=1024)
    p.add_argument("--num-epochs", type=int, default=40)
    p.add_argument("--steps-per-epoch", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1, help="per device")
    p.add_argument("--num-frames", type=int, default=8)
    p.add_argument("--max-objects", type=int, default=3)
    p.add_argument("--base-lr", type=float, default=5e-6)
    p.add_argument("--vision-lr", type=float, default=3e-6)
    p.add_argument("--layer-decay", type=float, default=0.9)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--restore", default=None)
    p.add_argument("--torch-ckpt", default=None, help="reference .pt to finetune from")
    p.add_argument("--coordinator-address", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument(
        "--supervise", type=int, default=0, metavar="N",
        help="run under the requeue supervisor: relaunch this command up "
        "to N times while it exits with the preemption code "
        f"({REQUEUE_EXIT_CODE}) — the SubmititRunner-requeue analogue",
    )
    args = p.parse_args(argv)

    if args.supervise:
        import sys

        rest = list(argv) if argv is not None else sys.argv[1:]
        # strip the flag so children train instead of supervising
        rest = [
            a for i, a in enumerate(rest)
            if not (
                a.startswith("--supervise")
                or (i > 0 and rest[i - 1] == "--supervise")
            )
        ]
        raise SystemExit(supervise(
            [sys.executable, "-m", "det_sam2_tpu.training.launch", *rest],
            max_requeues=args.supervise,
        ))

    pid, pcount = init_distributed(
        args.coordinator_address, args.num_processes, args.process_id
    )
    import jax

    logger.info(
        "process %d/%d, %d local / %d global devices",
        pid, pcount, jax.local_device_count(), jax.device_count(),
    )

    import jax.numpy as jnp

    from det_sam2_tpu.build import build_sam2_engine
    from det_sam2_tpu.configs import MODEL_CONFIGS, with_image_size
    from det_sam2_tpu.training.dataset import (
        PNGRawDataset,
        RandomUniformSampler,
        VOSDataLoader,
    )
    from det_sam2_tpu.training.sam2_train import PromptSimConf
    from det_sam2_tpu.training.train_step import OptimConf
    from det_sam2_tpu.training.trainer import Trainer, TrainerConf

    cfg = with_image_size(MODEL_CONFIGS[args.model](), args.image_size)
    # fp32 master params for training (inference builds default to bf16)
    engine = build_sam2_engine(
        cfg, checkpoint=args.torch_ckpt, dtype=jnp.float32
    )

    mesh = make_global_mesh()
    local_devices = jax.local_device_count()
    loader = VOSDataLoader(
        PNGRawDataset(args.img_folder, args.gt_folder),
        RandomUniformSampler(
            num_frames=args.num_frames, max_num_objects=args.max_objects
        ),
        image_size=args.image_size,
        batch_size=args.batch_size * local_devices,
        affine_prob=1.0,
        grayscale_prob=0.05,
        seed=1000 + pid,  # per-process data stream
    )
    trainer = Trainer(
        cfg,
        engine,
        optim_conf=OptimConf(
            base_lr=args.base_lr,
            vision_lr=args.vision_lr,
            layer_decay=args.layer_decay,
            total_steps=args.num_epochs * args.steps_per_epoch,
        ),
        trainer_conf=TrainerConf(
            num_epochs=args.num_epochs,
            steps_per_epoch=args.steps_per_epoch,
            checkpoint_dir=args.checkpoint_dir,
            prompt_sim=PromptSimConf(),
            clip_length=args.num_frames,
        ),
        mesh=mesh,
    )
    if args.restore:
        trainer.load_checkpoint(args.restore)
    trainer.run(DistributedDataLoader(loader, mesh))


if __name__ == "__main__":
    main()
