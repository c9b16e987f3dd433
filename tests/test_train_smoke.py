"""End-to-end engine smoke tests on the virtual CPU mesh."""
import argparse
import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow  # zoo/engine compile-heavy


def make_args(tmp_path, **over):
    d = dict(
        gpu_ids="0", project_name="t", checkpoint_root=str(tmp_path),
        num_workers=0, dataset="CDDataset", data_name="LEVIR",
        batch_size=4, split="train", split_val="val", img_size=64,
        n_class=2, net_G="newUNetTrans", loss="ce", optimizer="adamw",
        lr=0.001, max_epochs=2, lr_policy="linear", lr_decay_iters=100,
        bf16=False, seed=0,
    )
    d.update(over)
    args = argparse.Namespace(**d)
    args.checkpoint_dir = os.path.join(args.checkpoint_root, args.project_name)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    args.vis_dir = os.path.join(args.checkpoint_dir, "vis")
    return args


def synthetic_arrays(n=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)
    # B = A + localized change blob; label marks the blob.
    b = a.copy()
    label = np.zeros((n, size, size), np.uint8)
    blob = max(size // 4, 4)
    for i in range(n):
        y, x = rng.integers(2, size - blob - 2, 2)
        b[i, y:y + blob, x:x + blob] = rng.integers(0, 255, (blob, blob, 3))
        label[i, y:y + blob, x:x + blob] = 1
    return {"a": a, "b": b, "label": label}


def test_trainer_end_to_end_and_resume(tmp_path):
    from dahitra_tpu.train.engine import CDTrainer

    args = make_args(tmp_path)
    train_arrays = synthetic_arrays(4)
    val_arrays = synthetic_arrays(4, seed=1)

    trainer = CDTrainer(args, train_arrays, val_arrays,
                        mesh=__import__("dahitra_tpu.core.mesh",
                                        fromlist=["make_mesh"]).make_mesh(
                                            n_data=1, devices=jax.devices()[:1]))
    trainer.train_models()

    ckpt_dir = args.checkpoint_dir
    assert os.path.exists(os.path.join(ckpt_dir, "best_ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "train_acc.npy"))
    assert os.path.exists(os.path.join(ckpt_dir, "val_acc.npy"))
    assert os.path.exists(os.path.join(ckpt_dir, "log.txt"))
    val_curve = np.load(os.path.join(ckpt_dir, "val_acc.npy"))
    assert len(val_curve) == 2

    # Resume: a fresh trainer picks up the best checkpoint and epoch.
    trainer2 = CDTrainer(args, train_arrays, val_arrays, mesh=trainer.mesh)
    assert trainer2.epoch_to_start >= 1
    assert trainer2.best_val_acc == pytest.approx(trainer.best_val_acc)


def test_evaluator_runs_on_best_ckpt(tmp_path):
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.evalx.evaluator import CDEvaluator
    from dahitra_tpu.core.mesh import make_mesh

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    args = make_args(tmp_path, max_epochs=1)
    arrays = synthetic_arrays(4)
    CDTrainer(args, arrays, arrays, mesh=mesh).train_models()

    ev = CDEvaluator(args, arrays, mesh=mesh)
    scores = ev.eval_models()
    assert 0.0 <= scores["mf1"] <= 1.0
    assert os.path.exists(os.path.join(args.checkpoint_dir, "scores_dict.npy"))
    assert os.path.exists(os.path.join(args.checkpoint_dir, "log_test.txt"))


def test_loss_improves_on_overfit():
    """A few steps on one batch should reduce the focal+dice loss."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        args = make_args(td, max_epochs=1, net_G="base_resnet18", img_size=32,
                         lr=0.01, lr_policy="constant")
        arrays = synthetic_arrays(4, size=32)
        mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
        trainer = CDTrainer(args, arrays, arrays, mesh=mesh)
        d = trainer._put({k: v for k, v in arrays.items()})
        losses = []
        key = jax.random.PRNGKey(0)
        for i in range(12):
            key, sub = jax.random.split(key)
            trainer.state, loss, _ = trainer._train_step(
                trainer.state, d["a"], d["b"], d["label"], sub)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses


def test_multi_scale_loss_changeformer(tmp_path):
    """Deep supervision path (trainer.py:271-285 recipe) trains ChangeFormerV6."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    args = make_args(tmp_path, net_G="changeFormerV6", img_size=64,
                     max_epochs=1, batch_size=2)
    args.multi_scale_loss = True
    arrays = synthetic_arrays(2, size=64)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    trainer = CDTrainer(args, arrays, arrays, mesh=mesh)
    d = trainer._put(arrays)
    state0 = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.state.params)
    trainer.state, loss, cm = trainer._train_step(
        trainer.state, d["a"], d["b"], d["label"], jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    changed = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                           state0, trainer.state.params)
    assert any(jax.tree.leaves(changed))


def test_scan_epoch_matches_loop_metrics(tmp_path):
    """The one-dispatch scan epoch produces finite loss/CM and updates
    params like the per-step loop."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    arrays = synthetic_arrays(8, size=32)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])

    args = make_args(tmp_path, project_name="scan", net_G="base_resnet18",
                     img_size=32, batch_size=4, max_epochs=1)
    args.scan_epoch = True
    tr = CDTrainer(args, arrays, arrays, mesh=mesh)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
    scores = tr.train_one_epoch(0)
    assert 0.0 <= scores["mf1"] <= 1.0
    changed = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                           p0, tr.state.params)
    assert any(jax.tree.leaves(changed))
    # Second epoch reuses the staged dataset (no re-stage crash).
    tr.train_one_epoch(1)


def test_scan_epoch_equals_step_loop(tmp_path):
    """EXACT equality: one lax.scan epoch == the same batches stepped one at
    a time from the same initial state (not just finiteness)."""
    import jax.numpy as jnp
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    arrays = synthetic_arrays(8, size=32)
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    args = make_args(tmp_path, project_name="scaneq", net_G="base_resnet18",
                     img_size=32, batch_size=4, max_epochs=1)
    args.scan_epoch = True
    tr = CDTrainer(args, arrays, arrays, mesh=mesh)
    tr._stage_train()
    n_batches = tr._staged_n // args.batch_size
    perm = tr._epoch_perm(0, n_batches, args.batch_size)
    keys = jax.random.split(jax.random.PRNGKey(42), n_batches)
    a_f, b_f, l_f = tr._staged_train

    state_scan, losses_scan, cm_scan = tr._train_epoch_scan(
        tr.state, a_f, b_f, l_f, jnp.asarray(perm), keys)

    # replay per-step from the same initial replicated state
    tr2 = CDTrainer(args, arrays, arrays, mesh=mesh)
    state = tr2.state
    losses_loop, cms = [], []
    for i in range(n_batches):
        idx = perm[i]
        state, loss, cm = tr2._train_step(
            state, a_f[idx], b_f[idx], l_f[idx], keys[i])
        losses_loop.append(float(loss))
        cms.append(np.asarray(cm))
    # Step 1 is bitwise-identical; later steps drift at fp32 fusion noise
    # (XLA schedules the scan body differently from the standalone step).
    assert float(losses_scan[0]) == losses_loop[0]
    np.testing.assert_allclose(np.asarray(losses_scan), losses_loop,
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cm_scan), sum(cms), atol=20)
    # AdamW normalizes by sqrt(v): where grads are ~0, fusion-level fp32
    # noise flips the update sign and the per-element difference saturates
    # at ~lr per step. Bound by 2 steps * lr.
    for a, b in zip(jax.tree.leaves(state_scan.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.5 * args.lr)


def test_scan_epoch_multidevice(tmp_path):
    """Scan-epoch training on the full 8-device data mesh: staged dataset
    sharded over 'data', shard-local gathers, GSPMD grad sync."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    arrays = synthetic_arrays(16, size=32)
    mesh = make_mesh(n_data=8, n_space=1)
    args = make_args(tmp_path, project_name="scan8", net_G="base_resnet18",
                     img_size=32, batch_size=8, max_epochs=1)
    args.scan_epoch = True
    tr = CDTrainer(args, arrays, arrays, mesh=mesh)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state.params)
    scores = tr.train_one_epoch(0)
    assert 0.0 <= scores["mf1"] <= 1.0
    changed = jax.tree.map(lambda a, b: not np.allclose(a, np.asarray(b)),
                           p0, tr.state.params)
    assert any(jax.tree.leaves(changed))


def test_evaluator_per_group_scores(tmp_path):
    """group_of regrouping: per-group blocks equal independent evaluation
    of each group's sub-arrays (the 16-patch sweep semantics)."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.evalx.evaluator import CDEvaluator
    from dahitra_tpu.core.mesh import make_mesh

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    args = make_args(tmp_path, max_epochs=1, batch_size=3)
    arrays = synthetic_arrays(6)
    CDTrainer(args, arrays, arrays, mesh=mesh).train_models()

    group_of = np.array([0, 0, 0, 1, 1, 1], np.int32)
    ev = CDEvaluator(args, arrays, mesh=mesh)
    scores = ev.eval_models(group_of=group_of, save_vis=True)
    assert len(scores["per_group"]) == 2
    import glob
    assert glob.glob(os.path.join(args.vis_dir, "eval_*.jpg"))
    for gid in (0, 1):
        sub = {k: v[group_of == gid] for k, v in arrays.items()}
        ev_g = CDEvaluator(args, sub, mesh=mesh)
        want = ev_g.eval_models()
        got = scores["per_group"][gid]
        assert got["patch"] == gid
        assert got["mf1"] == pytest.approx(want["mf1"], abs=1e-6)
        assert got["acc"] == pytest.approx(want["acc"], abs=1e-6)
    # grouped scan path agrees too
    scores_scan = CDEvaluator(args, arrays, mesh=mesh).eval_models(
        scan=True, group_of=group_of)
    for a, b in zip(scores["per_group"], scores_scan["per_group"]):
        assert a["mf1"] == pytest.approx(b["mf1"], abs=1e-5)


def test_in_epoch_progress_lines_and_vis(tmp_path):
    """Per-batch path: periodic progress lines (imps/est/running mF1) and
    opt-in train vis dumps; scan path: chunked scans interleave lines."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    arrays = synthetic_arrays(8, size=32)

    args = make_args(tmp_path, project_name="obs", net_G="base_resnet18",
                     img_size=32, batch_size=2, max_epochs=1)
    args.log_every = 2
    args.vis_train_every = 3
    tr = CDTrainer(args, arrays, arrays, mesh=mesh)
    tr.train_one_epoch(0)
    log = open(os.path.join(args.checkpoint_dir, "log.txt")).read()
    assert "[0,2][4]" in log and "est:" in log and "running_mf1:" in log
    assert os.path.exists(os.path.join(args.vis_dir, "train_e0_b3.jpg"))

    args2 = make_args(tmp_path, project_name="obs_scan",
                      net_G="base_resnet18", img_size=32, batch_size=2,
                      max_epochs=1)
    args2.scan_epoch = True
    args2.log_chunks = 2
    tr2 = CDTrainer(args2, arrays, arrays, mesh=mesh)
    scores = tr2.train_one_epoch(0)
    assert 0.0 <= scores["mf1"] <= 1.0
    log2 = open(os.path.join(args2.checkpoint_dir, "log.txt")).read()
    assert "[0,2][4]" in log2  # interleaved mid-epoch line from chunk 1


def test_scan_validate_matches_per_batch(tmp_path):
    """scan_epoch validate (one-dispatch staged scan + ragged tail) gives
    the same confusion-matrix scores as the per-batch path."""
    from dahitra_tpu.train.engine import CDTrainer
    from dahitra_tpu.core.mesh import make_mesh

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    arrays = synthetic_arrays(7)  # ragged tail at batch 2 -> 3 full + 1 tail

    args_s = make_args(tmp_path, project_name="vscan", net_G="base_resnet18",
                       img_size=64, batch_size=2, max_epochs=1)
    args_s.scan_epoch = True
    tr_s = CDTrainer(args_s, arrays, arrays, mesh=mesh)
    s_scan = tr_s.validate(0)

    args_p = make_args(tmp_path, project_name="vloop", net_G="base_resnet18",
                       img_size=64, batch_size=2, max_epochs=1)
    tr_p = CDTrainer(args_p, arrays, arrays, mesh=mesh)
    # same init seed -> same params
    s_loop = tr_p.validate(0)
    assert s_scan["mf1"] == pytest.approx(s_loop["mf1"], abs=1e-6)
    assert s_scan["acc"] == pytest.approx(s_loop["acc"], abs=1e-6)
