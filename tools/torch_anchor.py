"""Torch-CPU anchor for the reference-stack throughput baseline.

The reference publishes no numbers (BASELINE.md), so bench.py's
``vs_baseline`` needs a defensible derivation. This script measures the
actual reference computation — ResNet-101 + BERT-base fwd+bwd in torch —
on this host's CPU, reports achieved GFLOP/s against the workload's
analytic FLOP count, and prints the roofline-derived V100 estimate used
as the baseline constant (documented in BENCH.md).

Workload FLOPs per sample (fwd, MACs x2):
  ResNet-101 @224^2 : 7.85 GMACs -> 15.7 GFLOP ; x3 fwd+bwd = 47.1
  BERT-base  @L=32  : 85M matmul params -> 2*85e6*32 = 5.4 GFLOP ;
                      x3 = 16.3
  total ~ 63.4 GFLOP/sample fwd+bwd.
"""

import time

import torch
import torch.nn as nn
import torch.nn.functional as F

GFLOP_PER_SAMPLE = 63.4


class Bottleneck(nn.Module):
    def __init__(self, cin, mid, stride=1):
        super().__init__()
        cout = mid * 4
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


def resnet101_trunk():
    layers = [nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
              nn.ReLU(), nn.MaxPool2d(3, 2, 1)]
    cin = 64
    for mid, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 23, 2),
                                (512, 3, 2)):
        for b in range(blocks):
            layers.append(Bottleneck(cin, mid, stride if b == 0 else 1))
            cin = mid * 4
    return nn.Sequential(*layers)


def main():
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    bs, img, seqlen = 4, 224, 32
    cnn = resnet101_trunk().train()
    bert = BertModel(BertConfig()).train()
    fc_i = nn.Linear(2048, 256)
    fc_t = nn.Linear(768, 256)
    params = (list(cnn.parameters()) + list(bert.parameters())
              + list(fc_i.parameters()) + list(fc_t.parameters()))

    images = torch.randn(bs, 3, img, img)
    ids = torch.randint(1, 30000, (bs, seqlen))
    mask = torch.ones(bs, seqlen, dtype=torch.long)

    def step():
        grid = cnn(images)
        img_f = fc_i(grid.mean((2, 3)))
        txt_f = fc_t(bert(input_ids=ids,
                          attention_mask=mask).last_hidden_state[:, 0])
        img_f = F.normalize(img_f)
        txt_f = F.normalize(txt_f)
        sims = img_f @ txt_f.t()
        loss = F.cross_entropy(sims * 10, torch.arange(bs))
        for p in params:
            p.grad = None
        loss.backward()

    step()  # warm
    n_steps = 3
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = (time.perf_counter() - t0) / n_steps
    sps = bs / dt
    gflops = sps * GFLOP_PER_SAMPLE
    print(f"torch CPU: {dt:.2f}s/step @bs{bs} -> {sps:.2f} samples/s "
          f"({gflops:.1f} GFLOP/s achieved)")
    # Documented V100 derivation (see BENCH.md): 125 TFLOP/s fp16 peak,
    # 25-35% MFU typical for torch mixed conv+transformer training.
    for mfu in (0.25, 0.30, 0.35):
        est = 125e12 * mfu / (GFLOP_PER_SAMPLE * 1e9)
        print(f"V100 fp16 @ {int(mfu*100)}% MFU -> "
              f"{est:.0f} samples/s")


if __name__ == "__main__":
    main()
