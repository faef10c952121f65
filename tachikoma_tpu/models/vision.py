"""Built-in model zoo (float graphs, NHWC).

The counterpart of the reference's relay testing model zoo
(`python/tvm/relay/testing/{mlp,lenet...,resnet,mobilenet,vgg,squeezenet}.py`)
— used by tests, benchmarks, and as quantization targets.  Weights are
randomly initialized (seeded) unless given.
"""

from __future__ import annotations

import numpy as np

from ..ir.graph import Graph, GraphBuilder
from ..ir.infer import infer_types


def _rng(seed):
    return np.random.default_rng(seed)


def _conv(b, x, cin, cout, k, stride, pad, rng, name, groups=1, dtype=np.float32):
    fan_in = k * k * cin // groups
    w = (rng.standard_normal((k, k, cin // groups, cout)) * np.sqrt(2.0 / fan_in)).astype(dtype)
    wn = b.const(w, name=f"{name}_w")
    return b.call(
        "nn.conv2d", x, wn, strides=(stride, stride),
        padding=(pad, pad, pad, pad), groups=groups, name=name,
    )


def _bn(b, x, c, rng, name):
    gamma = b.const(np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5, name=f"{name}_g")
    beta = b.const((rng.standard_normal(c) * 0.1).astype(np.float32), name=f"{name}_b")
    mean = b.const((rng.standard_normal(c) * 0.1).astype(np.float32), name=f"{name}_m")
    var = b.const(np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5, name=f"{name}_v")
    return b.call("nn.batch_norm", x, gamma, beta, mean, var, name=name)


def _dense(b, x, cin, cout, rng, name, bias=True):
    w = (rng.standard_normal((cin, cout)) * np.sqrt(2.0 / cin)).astype(np.float32)
    y = b.call("nn.dense", x, b.const(w, name=f"{name}_w"), name=name)
    if bias:
        bb = b.const((rng.standard_normal(cout) * 0.01).astype(np.float32), name=f"{name}_b")
        y = b.call("nn.bias_add", y, bb, name=f"{name}_biased")
    return y


def mlp(batch_size=1, in_dim=784, hidden=(128, 64), num_classes=10, seed=0) -> Graph:
    """`python/tvm/relay/testing/mlp.py` equivalent."""
    rng = _rng(seed)
    b = GraphBuilder("mlp")
    x = b.var("data", (batch_size, in_dim), "float32")
    h = x
    dims = [in_dim] + list(hidden)
    for i in range(len(hidden)):
        h = _dense(b, h, dims[i], dims[i + 1], rng, f"fc{i}")
        h = b.call("nn.relu", h, name=f"relu{i}")
    h = _dense(b, h, dims[-1], num_classes, rng, "fc_out")
    out = b.call("nn.softmax", h, name="prob")
    return infer_types(b.build(out))


def lenet5(batch_size=1, num_classes=10, seed=0) -> Graph:
    """LeNet-5 for 28x28x1 MNIST — BASELINE config 1's model."""
    rng = _rng(seed)
    b = GraphBuilder("lenet5")
    x = b.var("data", (batch_size, 28, 28, 1), "float32")
    c1 = _conv(b, x, 1, 6, 5, 1, 2, rng, "conv1")
    bias1 = b.const((rng.standard_normal(6) * 0.01).astype(np.float32), name="conv1_b")
    c1 = b.call("nn.bias_add", c1, bias1, name="conv1_biased")
    r1 = b.call("nn.relu", c1, name="relu1")
    p1 = b.call("nn.max_pool2d", r1, pool_size=(2, 2), strides=(2, 2), name="pool1")
    c2 = _conv(b, p1, 6, 16, 5, 1, 0, rng, "conv2")
    bias2 = b.const((rng.standard_normal(16) * 0.01).astype(np.float32), name="conv2_b")
    c2 = b.call("nn.bias_add", c2, bias2, name="conv2_biased")
    r2 = b.call("nn.relu", c2, name="relu2")
    p2 = b.call("nn.max_pool2d", r2, pool_size=(2, 2), strides=(2, 2), name="pool2")
    f = b.call("nn.batch_flatten", p2, name="flat")
    d1 = _dense(b, f, 5 * 5 * 16, 120, rng, "fc1")
    r3 = b.call("nn.relu", d1, name="relu3")
    d2 = _dense(b, r3, 120, 84, rng, "fc2")
    r4 = b.call("nn.relu", d2, name="relu4")
    d3 = _dense(b, r4, 84, num_classes, rng, "fc3")
    out = b.call("nn.softmax", d3, name="prob")
    return infer_types(b.build(out))


def _res_block(b, x, cin, cout, stride, rng, name):
    c1 = _conv(b, x, cin, cout, 3, stride, 1, rng, f"{name}_conv1")
    n1 = _bn(b, c1, cout, rng, f"{name}_bn1")
    r1 = b.call("nn.relu", n1, name=f"{name}_relu1")
    c2 = _conv(b, r1, cout, cout, 3, 1, 1, rng, f"{name}_conv2")
    n2 = _bn(b, c2, cout, rng, f"{name}_bn2")
    if stride != 1 or cin != cout:
        sc = _conv(b, x, cin, cout, 1, stride, 0, rng, f"{name}_down")
        sc = _bn(b, sc, cout, rng, f"{name}_bn_down")
    else:
        sc = x
    s = b.call("add", n2, sc, name=f"{name}_add")
    return b.call("nn.relu", s, name=f"{name}_out")


def _bottleneck(b, x, cin, cmid, cout, stride, rng, name):
    c1 = _conv(b, x, cin, cmid, 1, 1, 0, rng, f"{name}_conv1")
    n1 = _bn(b, c1, cmid, rng, f"{name}_bn1")
    r1 = b.call("nn.relu", n1, name=f"{name}_relu1")
    c2 = _conv(b, r1, cmid, cmid, 3, stride, 1, rng, f"{name}_conv2")
    n2 = _bn(b, c2, cmid, rng, f"{name}_bn2")
    r2 = b.call("nn.relu", n2, name=f"{name}_relu2")
    c3 = _conv(b, r2, cmid, cout, 1, 1, 0, rng, f"{name}_conv3")
    n3 = _bn(b, c3, cout, rng, f"{name}_bn3")
    if stride != 1 or cin != cout:
        sc = _conv(b, x, cin, cout, 1, stride, 0, rng, f"{name}_down")
        sc = _bn(b, sc, cout, rng, f"{name}_bn_down")
    else:
        sc = x
    s = b.call("add", n3, sc, name=f"{name}_add")
    return b.call("nn.relu", s, name=f"{name}_out")


def resnet(num_layers=18, batch_size=1, image_size=224, num_classes=1000, seed=0) -> Graph:
    """ResNet-18/34/50 (`python/tvm/relay/testing/resnet.py` equivalent;
    ResNet-50 is the BASELINE's channel-partitioned target)."""
    cfgs = {
        18: ("basic", [2, 2, 2, 2]),
        34: ("basic", [3, 4, 6, 3]),
        50: ("bottleneck", [3, 4, 6, 3]),
    }
    kind, blocks = cfgs[num_layers]
    rng = _rng(seed)
    b = GraphBuilder(f"resnet{num_layers}")
    x = b.var("data", (batch_size, image_size, image_size, 3), "float32")
    c = _conv(b, x, 3, 64, 7, 2, 3, rng, "conv0")
    n = _bn(b, c, 64, rng, "bn0")
    r = b.call("nn.relu", n, name="relu0")
    h = b.call("nn.max_pool2d", r, pool_size=(3, 3), strides=(2, 2), padding=(1, 1, 1, 1), name="pool0")
    channels = [64, 128, 256, 512]
    cin = 64
    for stage, (nblocks, cw) in enumerate(zip(blocks, channels)):
        for i in range(nblocks):
            stride = 2 if (stage > 0 and i == 0) else 1
            if kind == "basic":
                h = _res_block(b, h, cin, cw, stride, rng, f"s{stage}b{i}")
                cin = cw
            else:
                cout = cw * 4
                h = _bottleneck(b, h, cin, cw, cout, stride, rng, f"s{stage}b{i}")
                cin = cout
    gap = b.call("nn.global_avg_pool2d", h, keepdims=False, name="gap")
    out = _dense(b, gap, cin, num_classes, rng, "fc")
    sm = b.call("nn.softmax", out, name="prob")
    return infer_types(b.build(sm))


def _inverted_residual(b, x, cin, cout, stride, expand, rng, name):
    cmid = cin * expand
    h = x
    if expand != 1:
        h = _conv(b, h, cin, cmid, 1, 1, 0, rng, f"{name}_expand")
        h = _bn(b, h, cmid, rng, f"{name}_bn0")
        h = b.call("clip", h, a_min=0.0, a_max=6.0, name=f"{name}_relu6_0")
    # depthwise
    h = _conv(b, h, cmid, cmid, 3, stride, 1, rng, f"{name}_dw", groups=cmid)
    h = _bn(b, h, cmid, rng, f"{name}_bn1")
    h = b.call("clip", h, a_min=0.0, a_max=6.0, name=f"{name}_relu6_1")
    h = _conv(b, h, cmid, cout, 1, 1, 0, rng, f"{name}_project")
    h = _bn(b, h, cout, rng, f"{name}_bn2")
    if stride == 1 and cin == cout:
        h = b.call("add", h, x, name=f"{name}_add")
    return h


def mobilenet_v2(batch_size=1, image_size=224, num_classes=1000, width_mult=1.0, seed=0) -> Graph:
    """MobileNetV2 — BASELINE config 2 (depthwise+pointwise qnn kernels)."""
    rng = _rng(seed)
    b = GraphBuilder("mobilenet_v2")
    x = b.var("data", (batch_size, image_size, image_size, 3), "float32")

    def c8(ch):
        return max(8, int(np.ceil(ch * width_mult / 8) * 8))

    h = _conv(b, x, 3, c8(32), 3, 2, 1, rng, "conv0")
    h = _bn(b, h, c8(32), rng, "bn0")
    h = b.call("clip", h, a_min=0.0, a_max=6.0, name="relu6_0")
    cin = c8(32)
    # t (expand), c (out), n (repeat), s (stride)
    cfg = [
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    ]
    idx = 0
    for t, c, nrep, s in cfg:
        for i in range(nrep):
            stride = s if i == 0 else 1
            h = _inverted_residual(b, h, cin, c8(c), stride, t, rng, f"ir{idx}")
            cin = c8(c)
            idx += 1
    h = _conv(b, h, cin, 1280, 1, 1, 0, rng, "conv_last")
    h = _bn(b, h, 1280, rng, "bn_last")
    h = b.call("clip", h, a_min=0.0, a_max=6.0, name="relu6_last")
    gap = b.call("nn.global_avg_pool2d", h, keepdims=False, name="gap")
    out = _dense(b, gap, 1280, num_classes, rng, "fc")
    sm = b.call("nn.softmax", out, name="prob")
    return infer_types(b.build(sm))


def vgg(num_layers=16, batch_size=1, image_size=224, num_classes=1000, seed=0) -> Graph:
    """VGG-11/13/16/19 (`python/tvm/relay/testing/vgg.py` equivalent)."""
    plans = {
        11: (1, 1, 2, 2, 2),
        13: (2, 2, 2, 2, 2),
        16: (2, 2, 3, 3, 3),
        19: (2, 2, 4, 4, 4),
    }
    plan = plans[num_layers]
    widths = (64, 128, 256, 512, 512)
    rng = _rng(seed)
    b = GraphBuilder(f"vgg{num_layers}")
    x = b.var("data", (batch_size, image_size, image_size, 3), "float32")
    h, cin = x, 3
    for stage, (reps, cw) in enumerate(zip(plan, widths)):
        for i in range(reps):
            h = _conv(b, h, cin, cw, 3, 1, 1, rng, f"conv{stage}_{i}")
            bias = b.const((rng.standard_normal(cw) * 0.01).astype(np.float32))
            h = b.call("nn.bias_add", h, bias)
            h = b.call("nn.relu", h, name=f"relu{stage}_{i}")
            cin = cw
        h = b.call("nn.max_pool2d", h, pool_size=(2, 2), strides=(2, 2), name=f"pool{stage}")
    h = b.call("nn.batch_flatten", h, name="flat")
    feat = (image_size // 32) ** 2 * 512
    h = _dense(b, h, feat, 4096, rng, "fc6")
    h = b.call("nn.relu", h)
    h = _dense(b, h, 4096, 4096, rng, "fc7")
    h = b.call("nn.relu", h)
    h = _dense(b, h, 4096, num_classes, rng, "fc8")
    return infer_types(b.build(b.call("nn.softmax", h, name="prob")))


def squeezenet(batch_size=1, image_size=224, num_classes=1000, seed=0) -> Graph:
    """SqueezeNet v1.1 (`python/tvm/relay/testing/squeezenet.py` equivalent)."""
    rng = _rng(seed)
    b = GraphBuilder("squeezenet")

    def fire(h, cin, squeeze, expand, name):
        s = _conv(b, h, cin, squeeze, 1, 1, 0, rng, f"{name}_squeeze")
        s = b.call("nn.relu", s)
        e1 = _conv(b, s, squeeze, expand, 1, 1, 0, rng, f"{name}_e1")
        e1 = b.call("nn.relu", e1)
        e3 = _conv(b, s, squeeze, expand, 3, 1, 1, rng, f"{name}_e3")
        e3 = b.call("nn.relu", e3)
        return b.call("concatenate", e1, e3, axis=3, name=f"{name}_out"), expand * 2

    x = b.var("data", (batch_size, image_size, image_size, 3), "float32")
    h = _conv(b, x, 3, 64, 3, 2, 0, rng, "conv1")
    h = b.call("nn.relu", h)
    h = b.call("nn.max_pool2d", h, pool_size=(3, 3), strides=(2, 2), name="pool1")
    cin = 64
    h, cin = fire(h, cin, 16, 64, "fire2")
    h, cin = fire(h, cin, 16, 64, "fire3")
    h = b.call("nn.max_pool2d", h, pool_size=(3, 3), strides=(2, 2), name="pool3")
    h, cin = fire(h, cin, 32, 128, "fire4")
    h, cin = fire(h, cin, 32, 128, "fire5")
    h = b.call("nn.max_pool2d", h, pool_size=(3, 3), strides=(2, 2), name="pool5")
    h, cin = fire(h, cin, 48, 192, "fire6")
    h, cin = fire(h, cin, 48, 192, "fire7")
    h, cin = fire(h, cin, 64, 256, "fire8")
    h, cin = fire(h, cin, 64, 256, "fire9")
    h = _conv(b, h, cin, num_classes, 1, 1, 0, rng, "conv10")
    h = b.call("nn.relu", h)
    h = b.call("nn.global_avg_pool2d", h, keepdims=False, name="gap")
    return infer_types(b.build(b.call("nn.softmax", h, name="prob")))


def densenet(batch_size=1, image_size=224, num_classes=1000, growth=32,
             blocks=(6, 12, 24, 16), seed=0) -> Graph:
    """DenseNet-121-style (`python/tvm/relay/testing/densenet.py` equivalent)."""
    rng = _rng(seed)
    b = GraphBuilder("densenet")
    x = b.var("data", (batch_size, image_size, image_size, 3), "float32")
    h = _conv(b, x, 3, 64, 7, 2, 3, rng, "conv0")
    h = _bn(b, h, 64, rng, "bn0")
    h = b.call("nn.relu", h)
    h = b.call("nn.max_pool2d", h, pool_size=(3, 3), strides=(2, 2), padding=(1, 1, 1, 1))
    cin = 64
    for bi, reps in enumerate(blocks):
        for i in range(reps):
            y = _bn(b, h, cin, rng, f"b{bi}_{i}_bn")
            y = b.call("nn.relu", y)
            y = _conv(b, y, cin, growth, 3, 1, 1, rng, f"b{bi}_{i}_conv")
            h = b.call("concatenate", h, y, axis=3, name=f"b{bi}_{i}_cat")
            cin += growth
        if bi != len(blocks) - 1:
            h = _bn(b, h, cin, rng, f"t{bi}_bn")
            h = b.call("nn.relu", h)
            h = _conv(b, h, cin, cin // 2, 1, 1, 0, rng, f"t{bi}_conv")
            cin //= 2
            h = b.call("nn.avg_pool2d", h, pool_size=(2, 2), strides=(2, 2))
    h = _bn(b, h, cin, rng, "bn_final")
    h = b.call("nn.relu", h)
    h = b.call("nn.global_avg_pool2d", h, keepdims=False)
    out = _dense(b, h, cin, num_classes, rng, "fc")
    return infer_types(b.build(b.call("nn.softmax", out, name="prob")))


def inception_v3_stem(batch_size=1, image_size=299, num_classes=1000, seed=0) -> Graph:
    """Inception-v3-style net (stem + two inception blocks + head) —
    exercises the multi-branch concat topology of
    `python/tvm/relay/testing/inception_v3.py` at tractable size."""
    rng = _rng(seed)
    b = GraphBuilder("inception_v3")

    def conv_bn(h, cin, cout, k, stride, pad, name):
        h = _conv(b, h, cin, cout, k, stride, pad, rng, name)
        h = _bn(b, h, cout, rng, f"{name}_bn")
        return b.call("nn.relu", h, name=f"{name}_relu")

    x = b.var("data", (batch_size, image_size, image_size, 3), "float32")
    h = conv_bn(x, 3, 32, 3, 2, 0, "stem1")
    h = conv_bn(h, 32, 64, 3, 1, 1, "stem2")
    h = b.call("nn.max_pool2d", h, pool_size=(3, 3), strides=(2, 2))
    h = conv_bn(h, 64, 192, 3, 1, 1, "stem3")
    h = b.call("nn.max_pool2d", h, pool_size=(3, 3), strides=(2, 2))
    cin = 192
    for bi in range(2):
        b1 = conv_bn(h, cin, 64, 1, 1, 0, f"i{bi}_b1")
        b2 = conv_bn(h, cin, 48, 1, 1, 0, f"i{bi}_b2a")
        b2 = conv_bn(b2, 48, 64, 5, 1, 2, f"i{bi}_b2b")
        b3 = conv_bn(h, cin, 64, 1, 1, 0, f"i{bi}_b3a")
        b3 = conv_bn(b3, 64, 96, 3, 1, 1, f"i{bi}_b3b")
        p = b.call("nn.avg_pool2d", h, pool_size=(3, 3), strides=(1, 1),
                   padding=(1, 1, 1, 1), count_include_pad=True)
        b4 = conv_bn(p, cin, 32 if bi == 0 else 64, 1, 1, 0, f"i{bi}_b4")
        h = b.call("concatenate", b1, b2, b3, b4, axis=3, name=f"i{bi}_out")
        cin = 64 + 64 + 96 + (32 if bi == 0 else 64)
    h = b.call("nn.global_avg_pool2d", h, keepdims=False)
    out = _dense(b, h, cin, num_classes, rng, "fc")
    return infer_types(b.build(b.call("nn.softmax", out, name="prob")))


def dcgan_generator(batch_size=1, latent=100, seed=0) -> Graph:
    """DCGAN generator (`python/tvm/relay/testing/dcgan.py` equivalent) —
    exercises conv2d_transpose."""
    rng = _rng(seed)
    b = GraphBuilder("dcgan")
    z = b.var("noise", (batch_size, latent), "float32")
    h = _dense(b, z, latent, 4 * 4 * 512, rng, "proj")
    h = b.call("reshape", h, newshape=(batch_size, 4, 4, 512), name="reshape0")
    cin = 512
    for i, cout in enumerate((256, 128, 64)):
        w = (rng.standard_normal((4, 4, cin, cout)) * 0.05).astype(np.float32)
        h = b.call("nn.conv2d_transpose", h, b.const(w, name=f"deconv{i}_w"),
                   strides=(2, 2), padding=(1, 1, 1, 1), name=f"deconv{i}")
        h = _bn(b, h, cout, rng, f"dbn{i}")
        h = b.call("nn.relu", h)
        cin = cout
    w = (rng.standard_normal((4, 4, cin, 3)) * 0.05).astype(np.float32)
    h = b.call("nn.conv2d_transpose", h, b.const(w, name="deconv_out_w"),
               strides=(2, 2), padding=(1, 1, 1, 1), name="deconv_out")
    return infer_types(b.build(b.call("tanh", h, name="img")))


def dqn(batch_size=1, image_size=84, num_actions=18, seed=0) -> Graph:
    """DQN Atari net (`python/tvm/relay/testing/dqn.py` equivalent)."""
    rng = _rng(seed)
    b = GraphBuilder("dqn")
    x = b.var("data", (batch_size, image_size, image_size, 4), "float32")
    h = _conv(b, x, 4, 32, 8, 4, 0, rng, "conv1")
    h = b.call("nn.relu", h)
    h = _conv(b, h, 32, 64, 4, 2, 0, rng, "conv2")
    h = b.call("nn.relu", h)
    h = _conv(b, h, 64, 64, 3, 1, 0, rng, "conv3")
    h = b.call("nn.relu", h)
    h = b.call("nn.batch_flatten", h)
    feat = 7 * 7 * 64
    h = _dense(b, h, feat, 512, rng, "fc1")
    h = b.call("nn.relu", h)
    out = _dense(b, h, 512, num_actions, rng, "fc2")
    return infer_types(b.build(out))


def lstm(batch_size=1, seq_len=16, input_dim=64, hidden_dim=128, num_classes=10,
         seed=0) -> Graph:
    """Unrolled LSTM classifier (`python/tvm/relay/testing/lstm.py`
    equivalent; static shapes require unrolling — XLA re-rolls via CSE)."""
    rng = _rng(seed)
    b = GraphBuilder("lstm")
    x = b.var("data", (batch_size, seq_len, input_dim), "float32")
    w_ih = b.const((rng.standard_normal((input_dim, 4 * hidden_dim)) * 0.08).astype(np.float32), "w_ih")
    w_hh = b.const((rng.standard_normal((hidden_dim, 4 * hidden_dim)) * 0.08).astype(np.float32), "w_hh")
    bias = b.const((rng.standard_normal(4 * hidden_dim) * 0.01).astype(np.float32), "b")
    h = b.const(np.zeros((batch_size, hidden_dim), np.float32), "h0")
    c = b.const(np.zeros((batch_size, hidden_dim), np.float32), "c0")
    for t in range(seq_len):
        xt = b.call("strided_slice", x, begin=(0, t), end=(batch_size, t + 1),
                    strides=(1, 1), axes=(0, 1), name=f"x{t}_slice")
        xt = b.call("reshape", xt, newshape=(batch_size, input_dim), name=f"x{t}")
        gates = b.call("add", b.call("nn.dense", xt, w_ih), b.call("nn.dense", h, w_hh))
        gates = b.call("nn.bias_add", gates, bias, name=f"gates{t}")
        parts = b.call("split", gates, indices_or_sections=4, axis=1, name=f"split{t}")
        i_g = b.call("sigmoid", b.get_item(parts, 0))
        f_g = b.call("sigmoid", b.get_item(parts, 1))
        g_g = b.call("tanh", b.get_item(parts, 2))
        o_g = b.call("sigmoid", b.get_item(parts, 3))
        c = b.call("add", b.call("multiply", f_g, c), b.call("multiply", i_g, g_g),
                   name=f"c{t}")
        h = b.call("multiply", o_g, b.call("tanh", c), name=f"h{t}")
    out = _dense(b, h, hidden_dim, num_classes, rng, "fc")
    return infer_types(b.build(b.call("nn.softmax", out, name="prob")))
