"""training/launch.py coverage: single-process init, global mesh, host-local
-> global batch assembly, DistributedDataLoader, and a CLI main smoke run on
a synthetic DAVIS-layout dataset (reference entry point:
/root/reference/training/train.py:28-123)."""

import os

import numpy as np
import pytest

import jax

from det_sam2_tpu.training.launch import (
    DistributedDataLoader,
    host_local_batch_to_global,
    init_distributed,
    main,
    make_global_mesh,
)


def test_init_distributed_single_process():
    # no coordinator, single host: must no-op and report rank 0 of 1
    pid, pcount = init_distributed()
    assert pid == 0
    assert pcount == 1


def test_make_global_mesh_spans_all_devices():
    mesh = make_global_mesh()
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices()) == 8


def test_host_local_batch_to_global_roundtrip():
    mesh = make_global_mesh()
    t, b, s = 2, 8, 16
    rng = np.random.default_rng(0)
    images = rng.standard_normal((t, b, s, s, 3)).astype(np.float32)
    gt = (rng.random((t, b, s, s)) > 0.5).astype(np.float32)
    g_images, g_gt = host_local_batch_to_global(mesh, (images, gt), axis=1)
    # single process: the global array equals the local batch, sharded over
    # the mesh 'data' axis
    assert g_images.shape == images.shape
    assert not g_images.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(g_images), images)
    np.testing.assert_array_equal(np.asarray(g_gt), gt)


def test_distributed_dataloader_yields_global_shards():
    from det_sam2_tpu.training.dataset import (
        RandomUniformSampler,
        SyntheticRawDataset,
        VOSDataLoader,
    )

    mesh = make_global_mesh()
    loader = VOSDataLoader(
        SyntheticRawDataset(num_videos=2, num_frames=4),
        RandomUniformSampler(num_frames=2, max_num_objects=1),
        image_size=32,
        batch_size=8,
    )
    dl = DistributedDataLoader(loader, mesh)
    images, gt = next(iter(dl.batches(1)))
    assert images.shape == (2, 8, 32, 32, 3)
    assert gt.shape == (2, 8, 32, 32)
    assert not images.sharding.is_fully_replicated


def _write_synthetic_davis(root):
    from PIL import Image

    img_root = os.path.join(root, "JPEGImages")
    gt_root = os.path.join(root, "Annotations")
    rng = np.random.default_rng(0)
    for vid in ("video_a", "video_b"):
        os.makedirs(os.path.join(img_root, vid))
        os.makedirs(os.path.join(gt_root, vid))
        for f in range(4):
            frame = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(frame).save(
                os.path.join(img_root, vid, f"{f:05d}.jpg")
            )
            mask = np.zeros((64, 64), np.uint8)
            mask[10 + f : 40 + f, 20:50] = 1
            Image.fromarray(mask).save(
                os.path.join(gt_root, vid, f"{f:05d}.png")
            )
    return img_root, gt_root


@pytest.mark.slow
def test_main_cli_smoke(tmp_path, monkeypatch):
    """End-to-end CLI run: tiny model, 1 epoch x 1 step on the 8-device
    mesh, checkpoint written."""
    from det_sam2_tpu import configs

    monkeypatch.setitem(
        configs.MODEL_CONFIGS, "hiera_t", lambda: configs.tiny_test_config()
    )
    img_root, gt_root = _write_synthetic_davis(str(tmp_path))
    ckpt_dir = str(tmp_path / "ckpts")
    main(
        [
            "--img-folder", img_root,
            "--gt-folder", gt_root,
            "--model", "hiera_t",
            "--image-size", "128",
            "--num-epochs", "1",
            "--steps-per-epoch", "1",
            "--batch-size", "1",
            "--num-frames", "2",
            "--max-objects", "1",
            "--checkpoint-dir", ckpt_dir,
        ]
    )
    assert any(n.startswith("ckpt_") for n in os.listdir(ckpt_dir))


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    """Real multi-process rendezvous: 2 processes x 4 CPU devices join via
    init_distributed(coordinator, 2, pid); each contributes its local half
    of the global batch and verifies the assembled global array + a psum
    over the full mesh (the reference launcher's multiprocess mode,
    train.py:28-123, re-expressed as jax.distributed)."""
    import socket
    import subprocess
    import sys
    import textwrap

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent(f"""
        import os, sys
        pid = int(sys.argv[1])
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=4"
        )
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        import numpy as np
        from det_sam2_tpu.training.launch import (
            host_local_batch_to_global, init_distributed, make_global_mesh,
        )
        got_pid, got_count = init_distributed(
            coordinator_address="127.0.0.1:{port}",
            num_processes=2, process_id=pid,
        )
        assert (got_pid, got_count) == (pid, 2), (got_pid, got_count)
        assert jax.device_count() == 8 and jax.local_device_count() == 4
        mesh = make_global_mesh()
        # each process feeds its local 4 rows of the global batch of 8
        local = np.full((2, 4, 3), float(pid), np.float32)
        (g,) = host_local_batch_to_global(mesh, (local,), axis=1)
        assert g.shape == (2, 8, 3), g.shape
        from jax.sharding import NamedSharding, PartitionSpec as P
        total = jax.jit(
            lambda x: jax.numpy.sum(x),
            out_shardings=NamedSharding(mesh, P()),
        )(g)
        # halves are 0s and 1s -> the global sum is 2*4*3 = 24
        assert float(total) == 24.0, float(total)
        print(f"worker {{pid}} ok", flush=True)
    """))

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} ok" in out


def test_supervise_requeues_until_clean_exit(tmp_path):
    """The requeue supervisor (the SubmititRunner analogue) must relaunch
    the command while it exits with the preemption code (143 — what the
    trainer raises after its SIGTERM checkpoint) and stop on a clean
    exit, and must respect the requeue budget."""
    import sys
    import textwrap

    from det_sam2_tpu.training.launch import REQUEUE_EXIT_CODE, supervise

    counter = tmp_path / "launches"
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import pathlib, sys
        p = pathlib.Path({str(counter)!r})
        n = int(p.read_text()) if p.exists() else 0
        p.write_text(str(n + 1))
        sys.exit({REQUEUE_EXIT_CODE} if n < 2 else 0)
    """))
    rc = supervise([sys.executable, str(child)], max_requeues=5)
    assert rc == 0
    assert counter.read_text() == "3"  # 2 preemptions + 1 clean run

    # budget exhaustion: always-preempted child gives up with code 143
    counter.unlink()
    always = tmp_path / "always.py"
    always.write_text(
        f"import sys; sys.exit({REQUEUE_EXIT_CODE})"
    )
    rc = supervise([sys.executable, str(always)], max_requeues=2)
    assert rc == REQUEUE_EXIT_CODE


def test_supervise_forwards_sigterm_and_survives_to_requeue(tmp_path):
    """Preemption delivers SIGTERM to the SUPERVISOR (container PID 1 /
    systemd main pid): it must forward the signal to the trainer child —
    whose handler checkpoints and exits 143 — and survive to relaunch it.
    A naive subprocess.call supervisor dies from the same signal before
    the requeue."""
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    from det_sam2_tpu.training.launch import REQUEUE_EXIT_CODE

    running = tmp_path / "running"
    preempted = tmp_path / "preempted"
    child = tmp_path / "child.py"
    child.write_text(textwrap.dedent(f"""
        import pathlib, signal, sys, time
        preempted = pathlib.Path({str(preempted)!r})
        if preempted.exists():
            sys.exit(0)  # the relaunch after the preemption: clean run
        def on_term(signum, frame):
            preempted.write_text("checkpointed")
            sys.exit({REQUEUE_EXIT_CODE})
        signal.signal(signal.SIGTERM, on_term)
        pathlib.Path({str(running)!r}).write_text("up")
        time.sleep(60)  # preemption interrupts this
        sys.exit(1)     # never reached
    """))
    sup = subprocess.Popen([
        sys.executable, "-c", textwrap.dedent(f"""
            import sys
            from det_sam2_tpu.training.launch import supervise
            sys.exit(supervise([sys.executable, {str(child)!r}],
                               max_requeues=3))
        """)
    ])
    deadline = time.time() + 30
    while not running.exists():
        assert time.time() < deadline, "child never started"
        assert sup.poll() is None, "supervisor died early"
        time.sleep(0.05)
    # the preemption signal lands on the supervisor, NOT the child
    sup.send_signal(signal.SIGTERM)
    rc = sup.wait(timeout=30)
    assert rc == 0, "supervisor must survive the SIGTERM and requeue"
    assert preempted.read_text() == "checkpointed"
