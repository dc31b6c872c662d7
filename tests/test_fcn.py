import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from physimglobalpose_tpu.models import fcn


@pytest.mark.parametrize("name", list(fcn.MODEL_ZOO))
def test_model_zoo_shapes(name):
    model = fcn.build_model(name, num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 64, 64, 5)
    assert out.dtype == jnp.float32


def test_loss_ignores_last_label():
    logits = jnp.zeros((1, 4, 4, 3))
    labels_valid = jnp.zeros((1, 4, 4), jnp.int32)
    labels_ignored = jnp.full((1, 4, 4), 3, jnp.int32)  # == num_classes
    l1 = float(fcn.softmax_xent_ignore_last(logits, labels_valid))
    l2 = float(fcn.softmax_xent_ignore_last(logits, labels_ignored))
    assert abs(l1 - np.log(3)) < 1e-5
    assert l2 == 0.0


def test_train_step_reduces_loss():
    model = fcn.build_model("FCN_Vgg16_32s", num_classes=3)
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
    y = (jax.random.uniform(jax.random.key(2), (2, 32, 32)) * 3).astype(jnp.int32)
    params = model.init(jax.random.key(0), x)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = jax.jit(fcn.make_train_step(model, tx))
    params, opt_state, loss0 = step(params, opt_state, x, y)
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, x, y)
    assert float(loss) < float(loss0)


def test_predictor_interface():
    model = fcn.build_model("FCN_Vgg16_32s", num_classes=4)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    pred = fcn.make_predictor(model, params, [1, 2], input_size=(32, 32))
    color = np.zeros((24, 28, 3), np.uint8)
    out = pred(color, [1, 2])
    # Per-class maps for the wanted ids + the serving node's two sentinel
    # outputs: the argmax class image and the background-channel map
    # (predict:103-155 parity; Segmentation.cpp consumes all three).
    assert set(out) == {1, 2, fcn.PREDICTOR_LABEL_KEY,
                        fcn.PREDICTOR_BACKGROUND_KEY}
    label = out[fcn.PREDICTOR_LABEL_KEY]
    assert label.shape == (24, 28) and label.dtype == np.int32
    assert label.min() >= 0 and label.max() <= 3
    for c in (1, 2, fcn.PREDICTOR_BACKGROUND_KEY):
        p = out[c]
        assert p.shape == (24, 28)
        assert 0 <= p.min() and p.max() <= 1.0 + 1e-5
