"""Gradient transform: jax.grad over the whole-graph program matches torch
autograd on the same model, and a training loop actually descends."""

import numpy as np

from tachikoma_tpu import GraphBuilder, infer_types
from tachikoma_tpu.runtime.autodiff import grad_graph, value_and_grad_fn


def mlp_with_loss(rng):
    b = GraphBuilder()
    x = b.var("x", (4, 8), "float32")
    t = b.var("t", (4, 3), "float32")
    w1 = b.const(rng.standard_normal((8, 16)).astype(np.float32) * 0.3, "w1")
    w2 = b.const(rng.standard_normal((16, 3)).astype(np.float32) * 0.3, "w2")
    h = b.call("tanh", b.call("nn.dense", x, w1))
    logits = b.call("nn.dense", h, w2)
    lsm = b.call("nn.log_softmax", logits, axis=-1)
    loss = b.call("nn.cross_entropy_with_logits", lsm, t)
    return infer_types(b.build(loss))


def test_grads_match_torch(rng):
    import torch

    g = mlp_with_loss(rng)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = rng.dirichlet(np.ones(3), 4).astype(np.float32)
    loss, grads = grad_graph(g)({"x": x, "t": t})
    assert set(grads) == {"w1", "w2"}

    w1 = torch.tensor(g.params["w1"], requires_grad=True)
    w2 = torch.tensor(g.params["w2"], requires_grad=True)
    h = torch.tanh(torch.from_numpy(x) @ w1)
    lsm = torch.log_softmax(h @ w2, -1)
    tl = -(torch.from_numpy(t) * lsm).sum() / 4
    tl.backward()
    np.testing.assert_allclose(loss, tl.item(), rtol=1e-5)
    np.testing.assert_allclose(grads["w1"], w1.grad.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(grads["w2"], w2.grad.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_training_descends(rng):
    g = mlp_with_loss(rng)
    vg, train, frozen = value_and_grad_fn(g)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = rng.dirichlet(np.ones(3), 4).astype(np.float32)
    losses = []
    for _ in range(25):
        loss, grads = vg(train, {"x": x, "t": t})
        losses.append(float(loss))
        train = {k: v - 0.5 * grads[k] for k, v in train.items()}
    # cross-entropy is floored at the target entropy, so check descent
    assert losses[-1] < losses[0] - 0.15
    assert losses[-1] == min(losses)


def test_wrt_subset(rng):
    g = mlp_with_loss(rng)
    vg, train, frozen = value_and_grad_fn(g, wrt=["w2"])
    assert set(train) == {"w2"} and "w1" in frozen


def test_remat_matches(rng):
    g = mlp_with_loss(rng)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    t = rng.dirichlet(np.ones(3), 4).astype(np.float32)
    vg, train, _ = value_and_grad_fn(g)
    vgr, trainr, _ = value_and_grad_fn(g, remat=True)
    l1, g1 = vg(train, {"x": x, "t": t})
    l2, g2 = vgr(trainr, {"x": x, "t": t})
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in g1:
        np.testing.assert_allclose(g1[k], g2[k], rtol=1e-5, atol=1e-6)
