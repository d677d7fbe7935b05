"""CPU reference baseline for the north-star metric.

Re-creates the reference's optimize-stage per-batch workload in torch (CPU
build, the only torch in this image), with the same implementation *style*
the reference uses — per-token Python decode loop, straight-through softmax
feedback, back-translation second rollout, one-hot real input for the
discriminator — and measures sentences/sec for (one generator training step +
one discriminator backward + one greedy decode of the batch).

Run:  python benchmarks/torch_cpu_reference.py [--iters 5] [--batch 256]
Writes benchmarks/baseline_cpu.json with the measured rate + provenance.
"""

from __future__ import annotations

import argparse
import json
import platform
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

V, D_EMB, D_ENC, D_DEC, MAXLEN, NCLS = 10000, 128, 256, 512, 18, 2


class Seq2Seq(nn.Module):
    def __init__(self):
        super().__init__()
        self.tok = nn.Embedding(V, D_EMB)
        self.start = nn.Embedding(1, D_EMB)
        self.enc_style = nn.Embedding(NCLS, 2 * D_ENC)
        self.dec_style = nn.Embedding(NCLS, D_DEC)
        self.enc = nn.LSTM(D_EMB, D_ENC, batch_first=True, bidirectional=True)
        self.dec = nn.LSTM(D_EMB, D_DEC, batch_first=True)
        self.bridge = nn.Linear(2 * D_ENC, D_DEC, bias=False)
        self.ff1 = nn.Linear(2 * D_ENC + D_DEC, D_DEC)
        self.ff2 = nn.Linear(D_DEC, V, bias=False)
        self.act = nn.LeakyReLU(0.1)

    def forward(self, ids, src, tgt, teacher=None, soft=False, tau=0.1):
        h0 = self.enc_style(src).view(-1, 2, D_ENC).transpose(0, 1).contiguous()
        emb = self.tok(ids)
        memory, (_, c_end) = self.enc(emb, (h0, torch.zeros_like(h0)))
        B = ids.size(0)
        h = self.dec_style(tgt).unsqueeze(0)
        c = self.act(self.bridge(c_end.transpose(0, 1).reshape(1, B, -1)))
        x_t = self.start(torch.zeros(B, 1, dtype=torch.long))
        outs = []
        steps = MAXLEN if teacher is None else teacher.size(1)
        for t in range(steps):  # per-token Python loop, like the reference
            o, (h, c) = self.dec(x_t, (h, c))
            att = torch.softmax(o.bmm(memory.transpose(1, 2)) / memory.size(-1) ** 0.5, -1)
            ctx = att.bmm(memory)
            logit = self.ff2(self.act(self.ff1(torch.cat([o, ctx], -1))))
            if soft:
                p = torch.softmax(logit / tau, -1)
                hard = F.one_hot(p.argmax(-1), V).float() - p.detach() + p
                x_t = hard.matmul(self.tok.weight)
                outs.append(p)
            else:
                nxt = teacher[:, t].unsqueeze(1) if teacher is not None else logit.argmax(-1)
                x_t = self.tok(nxt)
                outs.append(logit)
        return torch.cat(outs, 1)


class CNNCls(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(V, D_EMB)
        self.convs = nn.ModuleList(
            [nn.Conv2d(1, 128, (k, D_EMB), padding=(k - 1, 0)) for k in (3, 4, 5)]
        )
        self.out = nn.Linear(384, NCLS)

    def forward(self, x):
        e = x.matmul(self.emb.weight) if x.dim() == 3 else self.emb(x)
        e = e.unsqueeze(1)
        hs = [F.relu(c(e)).squeeze(3).max(-1).values for c in self.convs]
        return self.out(torch.cat(hs, -1))


class PairScorer(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Embedding(V, 512)
        self.pos = nn.Embedding(100, 512)
        self.seg = nn.Embedding(2, 512)
        layer = nn.TransformerEncoderLayer(512, 8)
        self.enc = nn.TransformerEncoder(layer, 6)
        self.head = nn.Linear(512, 1)

    def embed(self, x, s):
        e = x.matmul(self.emb.weight) if x.dim() == 3 else self.emb(x)
        idx = torch.arange(x.size(1))
        return e + self.pos(idx)[None] + self.seg(torch.full((x.size(0), 1), s))

    def forward(self, a, b):
        h = torch.cat([self.embed(a, 0), self.embed(b, 1)], 1)
        h = self.enc(h.transpose(0, 1)).transpose(0, 1)
        return self.head(h.max(1).values).squeeze(-1)


class Disc(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.Linear(V, 128, bias=False)
        self.convs = nn.ModuleList(
            [nn.Conv2d(1, 300, (k, 8), stride=(1, 8)) for k in (2, 3, 4, 5)]
        )
        self.head = nn.Sequential(nn.Linear(1200, 100), nn.ReLU(), nn.Linear(100, 1))

    def forward(self, p):
        e = self.emb(p).unsqueeze(1)
        hs = [F.relu(c(e)).max(2).values for c in self.convs]
        h = torch.cat(hs, 1).permute(0, 2, 1).reshape(-1, 1200)
        return self.head(h).squeeze(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    torch.manual_seed(0)

    G, C, M, D = Seq2Seq(), CNNCls(), PairScorer(), Disc()
    opt_g = torch.optim.Adam(G.parameters(), lr=1e-5)
    ce, mse, bce = nn.CrossEntropyLoss(), nn.MSELoss(), nn.BCEWithLogitsLoss()

    B = args.batch
    x = torch.randint(0, V, (B, MAXLEN))
    labels = torch.randint(0, NCLS, (B,))

    def one_iter():
        # G step (reference main_optimize.py:96-113)
        sample_p = G(x, labels, 1 - labels, soft=True)
        s_loss = ce(C(sample_p), 1 - labels)
        c_loss = mse(M(sample_p, x), torch.zeros(B))
        adv = bce(D(sample_p), torch.ones(B * 16))
        bk = G(sample_p.argmax(-1), 1 - labels, labels, teacher=x)
        bk_loss = ce(bk.reshape(-1, V), x.reshape(-1))
        loss = bk_loss + 0.5 * c_loss + adv + 0.1 * s_loss
        opt_g.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(G.parameters(), 1.0)
        opt_g.step()
        # D backward (every batch; reference accumulates, applies every 4th)
        real = D(F.one_hot(x, V).float())
        with torch.no_grad():
            fake_p = G(x, labels, 1 - labels, soft=True)
        d_loss = 0.5 * (bce(real, torch.ones_like(real))
                        + bce(D(fake_p), torch.zeros(B * 16)))
        d_loss.backward()
        # greedy decode (test path)
        with torch.no_grad():
            G(x, labels, 1 - labels)

    one_iter()  # warm caches
    t0 = time.time()
    for _ in range(args.iters):
        one_iter()
    dt = time.time() - t0
    rate = args.iters * B / dt
    result = {
        "sentences_per_sec": rate,
        "batch": B,
        "iters": args.iters,
        "seconds": dt,
        "device": "cpu",
        "torch": torch.__version__,
        "platform": platform.platform(),
        "workload": "optimize G step + D backward + greedy decode, yelp shapes (V=10000, L=18)",
    }
    print(json.dumps(result))
    with open("benchmarks/baseline_cpu.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
