"""Elastic-recovery supervisor tests (tools/train_supervisor.py).

The reference has no failure handling (SURVEY §5); these cover the TPU-first
addition: restart-on-failure with resume, checkpoint-progress crash-loop
detection, and the ``cfg.train.ckpt_iter`` periodic-save + fault-injection
plumbing in ``engine/train.py``.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUP = os.path.join(REPO, "tools", "train_supervisor.py")


def _fake_main(tmp_path, body: str) -> str:
    """A stand-in for tools/main.py with the same CLI shape."""
    p = tmp_path / "fake_main.py"
    p.write_text(textwrap.dedent("""\
        import argparse, os, sys
        parser = argparse.ArgumentParser()
        parser.add_argument("--config", required=True)
        parser.add_argument("opts", nargs=argparse.REMAINDER)
        args = parser.parse_args()
        opts = dict(zip(args.opts[::2], args.opts[1::2]))
        # mirror tools/main.py:63 — effective run dir is output_dir/name
        out = os.path.join(opts["output_dir"], opts.get("name", "default"))
        os.makedirs(out, exist_ok=True)
        resumed = opts.get("train.resume_last", "") == "True"
    """) + textwrap.dedent(body))
    return str(p)


def _run_supervisor(fake_main, out_dir, extra=(), tmp_path=None):
    cfg_yaml = os.path.join(os.path.dirname(fake_main), "min.yaml")
    if not os.path.exists(cfg_yaml):
        open(cfg_yaml, "w").write("name: default\n")
    cmd = [sys.executable, SUP, "--config", cfg_yaml, "--backoff", "0.01",
           *extra, "--", "output_dir", out_dir]
    env = dict(os.environ, MAGGIE_SUPERVISOR_MAIN=fake_main,
               MAGGIE_SUPERVISOR_PROBE="true",  # backend "alive" by default
               MAGGIE_SUPERVISOR_PROBE_INTERVAL="0.01")
    return subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=120)


def test_supervisor_restarts_and_resumes(tmp_path):
    """Child crashes once after checkpointing, then finishes when resumed."""
    fake = _fake_main(tmp_path, """\
        step_file = os.path.join(out, "last_step.txt")
        ckpt = os.path.join(out, "last_state")
        if not resumed:
            os.makedirs(ckpt, exist_ok=True)
            open(step_file, "w").write("5")
            sys.exit(1)  # simulated preemption after saving iter 5
        assert open(step_file).read() == "5"
        open(os.path.join(out, "done.txt"), "w").write("ok")
        sys.exit(0)
    """)
    out = str(tmp_path / "run")
    r = _run_supervisor(fake, out)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(os.path.join(out, "default", "done.txt"))
    assert "launch #1" in r.stdout  # exactly one restart
    assert "train.resume_last True" in r.stdout


def test_supervisor_gives_up_on_crash_loop(tmp_path):
    """Three consecutive no-progress failures -> stop with the child's rc."""
    fake = _fake_main(tmp_path, """\
        sys.exit(7)  # crashes before ever checkpointing
    """)
    r = _run_supervisor(fake, str(tmp_path / "run2"))
    assert r.returncode == 7
    assert "crash loop" in r.stdout
    assert "launch #3" not in r.stdout  # 0,1,2 then give up


def test_supervisor_waits_out_backend_outage(tmp_path):
    """A dead backend is an outage, not a crash loop: the supervisor defers
    the launch until the probe passes and resets the no-progress streak, so
    tunnel downtime never trips the give-up heuristic."""
    flag = tmp_path / "backend_up"
    # probe fails until the flag file exists; create it from the probe's own
    # third invocation to keep the test single-process
    probe = (f'if [ -f "{flag}" ]; then exit 0; fi; '
             f'echo x >> "{flag}.tries"; '
             f'[ "$(wc -l < "{flag}.tries")" -ge 3 ] && touch "{flag}"; exit 1')
    fake = _fake_main(tmp_path, """\
        open(os.path.join(out, "ran.txt"), "w").write("ok")
        sys.exit(0)
    """)
    cfg_yaml = os.path.join(os.path.dirname(fake), "min.yaml")
    if not os.path.exists(cfg_yaml):
        open(cfg_yaml, "w").write("name: default\n")
    out = str(tmp_path / "run_outage")
    cmd = [sys.executable, SUP, "--config", cfg_yaml, "--backoff", "0.01",
           "--", "output_dir", out]
    env = dict(os.environ, MAGGIE_SUPERVISOR_MAIN=fake,
               MAGGIE_SUPERVISOR_PROBE=probe,
               MAGGIE_SUPERVISOR_PROBE_INTERVAL="0.01")
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "backend unreachable" in r.stdout
    assert os.path.exists(os.path.join(out, "default", "ran.txt"))


def test_supervisor_respects_max_restarts(tmp_path):
    """Progress every time but never finishing -> bounded by --max-restarts."""
    fake = _fake_main(tmp_path, """\
        step_file = os.path.join(out, "last_step.txt")
        ckpt = os.path.join(out, "last_state")
        os.makedirs(ckpt, exist_ok=True)
        prev = int(open(step_file).read()) if os.path.exists(step_file) else 0
        open(step_file, "w").write(str(prev + 1))  # always makes progress
        sys.exit(3)
    """)
    r = _run_supervisor(fake, str(tmp_path / "run3"), extra=("--max-restarts", "2"))
    assert r.returncode == 3
    assert "exceeded --max-restarts=2" in r.stdout
    assert "launch #2" in r.stdout and "launch #3" not in r.stdout


def test_fault_injection_env_plumbing(tmp_path, tiny_train_cfg=None):
    """MAGGIE_FAULT_INJECT_ITER raises in a fresh run, is skipped after resume.
    Covered in-process (no subprocess compile cost): drive engine.train twice."""
    import numpy as np
    import pytest
    from PIL import Image
    from maggie_tpu.config import load_config

    root = tmp_path / "him"
    timg = root / "tr/images"
    timg.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(timg / f"t{i}.jpg")
        adir = root / "tr/alphas" / f"t{i}"
        adir.mkdir(parents=True)
        a = np.zeros((64, 64), np.uint8)
        a[16:48, 16:48] = 255
        Image.fromarray(a).save(adir / "00.png")
    img_dir = root / "images/natural"
    img_dir.mkdir(parents=True)
    Image.fromarray(rs.randint(0, 255, (64, 64, 3), np.uint8)).save(img_dir / "v.jpg")
    for d in ("alphas", "masks"):
        vd = root / d / "natural/v"
        vd.mkdir(parents=True)
        a = np.zeros((64, 64), np.uint8)
        a[16:48, 16:48] = 255
        Image.fromarray(a).save(vd / "00.png")

    cfg = load_config()
    cfg.output_dir = str(tmp_path / "out")
    cfg.dataset.train.merge_from_other(dict(
        name="HIM", root_dir=str(root), split="tr", short_size=32, max_inst=2,
        crop=[32, 32], alpha_dir_name="alphas", mask_dir_name=""))
    cfg.dataset.test.merge_from_other(dict(
        name="HIM", root_dir=str(root), split="natural", short_size=32,
        alpha_dir_name="alphas", mask_dir_name="masks", downscale_mask=False))
    cfg.model.arch = "Dummy"
    cfg.test.merge_from_other(dict(batch_size=1, log_iter=1))
    cfg.train.merge_from_other(dict(batch_size=1, max_iter=4, log_iter=1, val_iter=100,
                                    ckpt_iter=1, val_metrics=["MAD"], val_best_metric="MAD",
                                    seed=3, num_workers=0))
    cfg.wandb.use = False

    from maggie_tpu.engine.train import train as run_train
    os.environ["MAGGIE_FAULT_INJECT_ITER"] = "2"
    try:
        with pytest.raises(RuntimeError, match="fault injection at iter 2"):
            run_train(cfg, use_wandb=False)
        # ckpt_iter=1 means iter 1 was checkpointed before the fault
        assert os.path.isdir(os.path.join(cfg.output_dir, "last_state"))
        assert open(os.path.join(cfg.output_dir, "last_step.txt")).read().strip() == "1"
        # resumed run must NOT re-fire the injection and must finish
        cfg.train.resume_last = True
        state = run_train(cfg, use_wandb=False)
        assert int(state.step) == 4
        assert open(os.path.join(cfg.output_dir, "last_step.txt")).read().strip() == "4"
    finally:
        del os.environ["MAGGIE_FAULT_INJECT_ITER"]
