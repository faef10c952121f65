"""Train a small CNN on sklearn's bundled digits set (offline, labeled) and
save its weights to tests/fixtures/digits_cnn.npz — the real-trained-model
fixture behind the dataset-accuracy harness tests (quantize/accuracy.py,
mrt `Trace.eval` analog).  Torch is used only HERE; tests rebuild the graph
with GraphBuilder from the npz.

    PYTHONPATH=/root/repo python scripts/make_digits_fixture.py
"""

import os

import numpy as np


def main():
    import torch
    import torch.nn as tnn

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tachikoma_tpu.quantize.dataset import digits

    torch.manual_seed(0)
    ds = digits(layout="NCHW")
    # train on the tail; the accuracy harness evaluates on the head split
    # so the fixture's eval numbers are held-out
    x = torch.tensor(ds.data[512:])
    y = torch.tensor(ds.labels[512:])

    model = tnn.Sequential(
        tnn.Conv2d(1, 8, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2),
        tnn.Conv2d(8, 16, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2),
        tnn.Flatten(), tnn.Linear(16 * 2 * 2, 10),
    )
    opt = torch.optim.Adam(model.parameters(), lr=3e-3)
    loss_fn = tnn.CrossEntropyLoss()
    for epoch in range(60):
        perm = torch.randperm(len(x))
        tot = 0.0
        for i in range(0, len(x), 64):
            idx = perm[i:i + 64]
            opt.zero_grad()
            loss = loss_fn(model(x[idx]), y[idx])
            loss.backward()
            opt.step()
            tot += float(loss) * len(idx)
        if epoch % 10 == 9:
            with torch.no_grad():
                acc = float((model(x).argmax(1) == y).float().mean())
            print(f"epoch {epoch}: loss {tot/len(x):.4f} train acc {acc:.4f}")

    with torch.no_grad():
        xe = torch.tensor(ds.data[:512])
        ye = torch.tensor(ds.labels[:512])
        acc = float((model(xe).argmax(1) == ye).float().mean())
    print(f"held-out (harness eval split) acc: {acc:.4f}")

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "digits_cnn.npz")
    np.savez(out, **sd, heldout_acc=np.float32(acc))
    print("wrote", out, {k: v.shape for k, v in sd.items()})


if __name__ == "__main__":
    main()
