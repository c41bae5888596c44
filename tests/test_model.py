import jax
import jax.numpy as jnp
import numpy as np

from cilrs_tpu.models import CILRS, cilrs_loss


def _init(batch=2, dropout=0.0, h=32, w=64):
    # Small spatial size + shallow stages: the trunk is fully convolutional, so
    # branch logic and conditioning are identical; full-size compile is covered
    # on TPU by bench.py and the graft entry.
    model = CILRS(dropout=dropout, stage_sizes=(1, 1, 1, 1))
    img = jnp.zeros((batch, h, w, 3), jnp.float32)
    speed = jnp.zeros((batch,), jnp.float32)
    cmd = jnp.zeros((batch,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, speed, cmd, train=False)
    return model, variables, (img, speed, cmd)


def test_param_count_matches_reference():
    # Reference reports 22.4 M params (README.md:22, train_config.json:12).
    # eval_shape avoids compiling the full 88x200 forward on CPU.
    model = CILRS(dropout=0.0)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 88, 200, 3), jnp.float32),
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            train=False,
        )
    )
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(shapes["params"]))
    assert 21.5e6 < n < 23.5e6, f"param count {n}"


def test_forward_shapes_and_finiteness():
    model, variables, (img, speed, cmd) = _init(batch=3)
    img = jax.random.normal(jax.random.PRNGKey(1), img.shape) * 0.5
    controls, pred_speed = model.apply(variables, img, speed, cmd, train=False)
    assert controls.shape == (3, 3)
    assert pred_speed.shape == (3,)
    assert np.isfinite(np.asarray(controls)).all()
    assert np.isfinite(np.asarray(pred_speed)).all()


def test_command_conditioning_selects_branch():
    model, variables, (img, speed, _) = _init(batch=4)
    img = jax.random.normal(jax.random.PRNGKey(2), img.shape) * 0.5
    out0, _ = model.apply(variables, img, speed, jnp.zeros(4, jnp.int32), train=False)
    out1, _ = model.apply(variables, img, speed, jnp.ones(4, jnp.int32), train=False)
    # Different commands route through different branch weights.
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # Same command -> identical within batch for identical inputs
    same_img = jnp.tile(img[:1], (4, 1, 1, 1))
    outs, _ = model.apply(variables, same_img, speed, jnp.zeros(4, jnp.int32), train=False)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[3]), rtol=1e-4, atol=1e-5)


def test_loss_values():
    cp = jnp.array([[0.1, 0.5, 0.0]])
    ct = jnp.array([[0.0, 0.5, 0.0]])
    sp = jnp.array([0.3])
    st = jnp.array([0.1])
    total, parts = cilrs_loss(cp, sp, ct, st)
    np.testing.assert_allclose(float(parts["steer_l1"]), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(parts["speed_mse"]), 0.04, atol=1e-6)
    np.testing.assert_allclose(float(total), 5 * 0.1 + 0.5 * 0.04, atol=1e-5)


def test_train_mode_with_dropout_runs():
    model = CILRS(dropout=0.5, stage_sizes=(1, 1, 1, 1))
    img = jnp.zeros((2, 32, 64, 3), jnp.float32)
    speed = jnp.zeros((2,), jnp.float32)
    cmd = jnp.zeros((2,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, speed, cmd, train=False)
    out, mutated = model.apply(
        variables, img, speed, cmd, train=True,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    controls, pred_speed = out
    assert controls.shape == (2, 3)
    assert "batch_stats" in mutated
