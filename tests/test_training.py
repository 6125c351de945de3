"""Training harness + trainable-CRF experiment tests.

Mirrors the reference's only end-to-end training evidence
(`trainableDenseCRF.ipynb` cell 14: Adam on masked MSE; the `oil` trainer
loop) at test scale: loss must drop and the learned CRF must beat its
starting point.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from depth_estimation_tpu.data.synthetic import make_stereo_pair
from depth_estimation_tpu.train.experiments import train_tsukuba_crf
from depth_estimation_tpu.train.trainer import Trainer, TrainState, cosine_lr


def test_trainer_fits_linear_regression(tmp_path):
    rng = np.random.RandomState(0)
    true_w = jnp.asarray([2.0, -1.0, 0.5])
    X = jnp.asarray(rng.randn(128, 3))
    y = X @ true_w

    def loss_fn(params, batch):
        xb, yb = batch
        return jnp.mean((xb @ params["w"] - yb) ** 2)

    trainer = Trainer(loss_fn, optax.adam(0.1), log_dir=str(tmp_path), log_every=5)
    state = trainer.init({"w": jnp.zeros(3)})
    batches = [(X, y)]
    state = trainer.fit(state, batches, num_steps=100)
    np.testing.assert_allclose(np.asarray(state.params["w"]), np.asarray(true_w), atol=0.05)
    assert (tmp_path / "train_log.jsonl").exists()


def test_trainer_checkpoint_roundtrip(tmp_path):
    def loss_fn(params, batch):
        return jnp.sum(params["w"] ** 2)

    trainer = Trainer(loss_fn, optax.adam(0.01), log_dir=str(tmp_path))
    state = trainer.init({"w": jnp.asarray([1.0, 2.0])})
    state = trainer.fit(state, [(None)], num_steps=3)
    trainer.save(state)
    restored = trainer.restore(trainer.init({"w": jnp.zeros(2)}))
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    assert int(restored.step) == 3


def test_trainable_crf_learns_on_synthetic():
    # End-to-end gradients through the lattice: 25 Adam steps on a small
    # synthetic pair must reduce the masked MSE.
    rng = np.random.RandomState(0)
    left, right, disp = make_stereo_pair(rng, h=40, w=60, max_disp=6)
    params, hist = train_tsukuba_crf(
        left.astype(np.float32),
        right.astype(np.float32),
        disp.astype(np.float32) + 1e-3,  # all pixels valid
        num_steps=25,
        lr=3e-2,
        num_disp=8,
        niters=2,
        d_feat=8,
    )
    assert np.isfinite(hist["loss"]).all()
    assert hist["mse_after"] < hist["mse_before"], hist
    # learned scales moved
    assert abs(float(params["log_s_ij"]) - np.log(0.1)) > 1e-4


def test_cosine_lr_schedule():
    sched = cosine_lr(1.0, 100)
    assert float(sched(0)) == 1.0
    assert float(sched(100)) < 1e-6
    assert 0.4 < float(sched(50)) < 0.6


def test_upsampler_training_improves_l1():
    from depth_estimation_tpu.train.experiments import train_upsampler

    rng = np.random.RandomState(0)
    items = []
    for i in range(2):
        left, _, disp = make_stereo_pair(np.random.RandomState(i), h=32, w=48, max_disp=6)
        disp = disp + 1.0  # all-valid
        items.append({
            "disp_lowres": disp[::4, ::4],
            "image": left.astype(np.float32),
            "disparity": disp.astype(np.float32),
        })
    params, hist = train_upsampler(items, num_steps=15, niters=1, r=3)
    assert np.isfinite(hist["loss"]).all()
    assert hist["l1_after"] < hist["l1_before"], hist


def test_trainer_mesh_dp_matches_unsharded():
    """Trainer(mesh=...) runs the update as one SPMD program with batches
    sharded over 'data'; losses must match the unsharded trainer exactly
    (the DataParallel-equivalence contract)."""
    import optax

    from depth_estimation_tpu.parallel.mesh import make_mesh
    from depth_estimation_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(16, 4), jnp.float32)
    yv = jnp.asarray(rng.randn(16), jnp.float32)

    def loss_fn(params, batch):
        x, t = batch
        return jnp.mean((x @ params["w"] - t) ** 2)

    def run(mesh):
        tr = Trainer(loss_fn, optax.sgd(0.1), mesh=mesh)
        state = tr.init({"w": jnp.zeros((4,), jnp.float32)})
        losses = []
        for i in range(4):
            state, loss = tr._update(state, tr._place_batch((X, yv)))
            losses.append(float(loss))
        return losses, state

    l_mesh, s_mesh = run(make_mesh(data=8, tile=1))
    l_plain, s_plain = run(None)
    np.testing.assert_allclose(l_mesh, l_plain, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_mesh.params["w"]), np.asarray(s_plain.params["w"]), rtol=1e-5
    )


def test_distributed_init_single_process_noop():
    from depth_estimation_tpu.parallel.mesh import distributed_init

    assert distributed_init() is False


def test_train_uncertainty_reduces_l1():
    """End-to-end confidence-weighted CRF training (`L1UncRegressor`,
    `crf/mb_stereo_crf.py:37-60`): the uncertainty head + guide projection
    + compatibility train jointly and reduce masked L1."""
    from depth_estimation_tpu.train.experiments import train_uncertainty

    left, right, disp = make_stereo_pair(np.random.RandomState(1), h=32, w=48, max_disp=6)
    items = [{"left": left, "right": right, "disparity": disp}]
    params, hist = train_uncertainty(
        items, num_steps=8, lr=3e-3, niters=1, r=5, num_disp=8, d_feat=8
    )
    assert np.isfinite(hist["loss"]).all()
    assert hist["l1_after"] < hist["l1_before"], hist
    # heteroscedastic variant also runs and stays finite
    _, hist2 = train_uncertainty(
        items, num_steps=2, lr=3e-3, niters=1, r=5, num_disp=8, d_feat=8,
        unc_weighted=True,
    )
    assert np.isfinite(hist2["loss"]).all()


def test_vgg_guidance_without_params_warns():
    # guidance='vgg' with no imported weights is NOT the reference
    # protocol (random-init taps); it must warn loudly (VERDICT r3 #7).
    import pytest

    rng = np.random.RandomState(1)
    left, right, disp = make_stereo_pair(rng, h=36, w=48, max_disp=4)
    with pytest.warns(UserWarning, match="RANDOM-init"):
        train_tsukuba_crf(
            left.astype(np.float32),
            right.astype(np.float32),
            disp.astype(np.float32) + 1e-3,
            num_steps=1,
            num_disp=4,
            niters=1,
            d_feat=4,
            guidance="vgg",
        )
