"""Measured PyTorch baseline: a compact replica of the reference architecture.

The reference publishes no throughput numbers (BASELINE.md), so both sides of
the comparison are measured on this machine.  This module reproduces the
reference's *architecture* — one OS process per environment with pipe RPC
(worker.py), an eager PyTorch TrXL forward per rollout step with
batched-index-select memory windows (trainer.py:145-225), and epochs x
minibatch PPO training (trainer.py:239-323) — written from the behavioral spec
in SURVEY.md, with a dependency-free NumPy PocMemoryEnv standing in for the
gym-based one (gym is not installed in this image).

Usage: python benchmarks/torch_reference_replica.py [--updates N]
Prints JSON: {"env_steps_per_second": ...}
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np
import torch
import torch.nn as nn


# --------------------------------------------------------------------------
# NumPy PocMemoryEnv (behavior per environments/poc_memory_env.py, §2 #8a)
class NumpyPocMemoryEnv:
    def __init__(self, step_size=0.2, freeze=True, max_episode_steps=32):
        self.step_size = step_size
        self.freeze = freeze
        self.max_episode_steps = max_episode_steps
        self.min_steps = int(1.0 / step_size) + 1
        self.start_positions = [-0.4, -0.2, 0.0, 0.2, 0.4]

    def reset(self):
        self.pos = float(np.random.choice(self.start_positions))
        self.goals = np.array([-1.0, 1.0])[np.random.permutation(2)]
        self.t = 0
        self.ret = 0.0
        return np.array([self.goals[0], self.pos, self.goals[1]], np.float32)

    def step(self, action):
        reward, done, info = 0.0, False, None
        if self.t >= self.max_episode_steps - 1:
            done = True
        show = self.t < 2
        if show and self.freeze:
            self.t += 1
            return (np.array([self.goals[0], self.pos, self.goals[1]],
                             np.float32), 0.0, done, None)
        self.pos = round(self.pos + (self.step_size if action[0] == 1
                                     else -self.step_size), 2)
        if show:
            obs = np.array([self.goals[0], self.pos, self.goals[1]], np.float32)
        else:
            obs = np.array([0.0, self.pos, 0.0], np.float32)
        success = False
        if self.pos in (-1.0, 1.0):
            g = self.goals[0] if self.pos == -1.0 else self.goals[1]
            bonus = 1.0 + self.min_steps * 0.1
            reward = bonus if g == 1.0 else -bonus
            success = g == 1.0
            done = True
        else:
            reward = -0.1
        self.ret += reward
        self.t += 1
        if done:
            info = {"success": success, "reward": self.ret, "length": self.t}
        return obs, reward, done, info


def _worker(remote):
    env = NumpyPocMemoryEnv()
    while True:
        cmd, data = remote.recv()
        if cmd == "step":
            remote.send(env.step(data))
        elif cmd == "reset":
            remote.send(env.reset())
        else:
            remote.close()
            break


# --------------------------------------------------------------------------
# Eager-torch TrXL policy (per transformer.py / model.py semantics)
class TorchBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.dim, self.heads = dim, heads
        self.q = nn.Linear(dim, dim, bias=False)
        self.k = nn.Linear(dim, dim, bias=False)
        self.v = nn.Linear(dim, dim, bias=False)
        self.o = nn.Linear(dim, dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm_kv = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.fc = nn.Sequential(nn.Linear(dim, dim), nn.ReLU())

    def forward(self, mem, query, mask):
        B, L, D = mem.shape
        hd = D // self.heads
        q_ = self.norm1(query)
        kv = self.norm_kv(mem)
        q = self.q(q_).view(B, 1, self.heads, hd)
        k = self.k(kv).view(B, L, self.heads, hd)
        v = self.v(kv).view(B, L, self.heads, hd)
        energy = torch.einsum("bqhd,bkhd->bhqk", q, k)
        energy = energy.masked_fill(~mask[:, None, None, :], -1e20)
        att = torch.softmax(energy / (D ** 0.5), dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, 1, D)
        h = self.o(out) + query
        return self.fc(self.norm2(h)) + h


class TorchPolicy(nn.Module):
    def __init__(self, obs_dim, dim, blocks, heads, hidden, n_actions):
        super().__init__()
        self.embed = nn.Linear(obs_dim, dim)
        self.blocks = nn.ModuleList(TorchBlock(dim, heads) for _ in range(blocks))
        self.pi_hidden = nn.Linear(dim, hidden)
        self.v_hidden = nn.Linear(dim, hidden)
        self.pi = nn.Linear(hidden, n_actions)
        self.v = nn.Linear(hidden, 1)

    def forward(self, obs, memory, mask):
        h = torch.relu(self.embed(obs))
        new_mem = []
        for i, block in enumerate(self.blocks):
            new_mem.append(h.detach())
            h = block(memory[:, :, i], h.unsqueeze(1), mask).squeeze(1)
        logits = self.pi(torch.relu(self.pi_hidden(h)))
        value = self.v(torch.relu(self.v_hidden(h))).squeeze(-1)
        return logits, value, torch.stack(new_mem, 1)


def batched_index_select(x, indices):
    idx = indices[(...,) + (None,) * (x.dim() - 2)].expand(
        -1, -1, *x.shape[2:])
    return torch.gather(x, 1, idx)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--updates", type=int, default=3)
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--steps", type=int, default=128)
    args = parser.parse_args()

    W, T, max_ep, L = args.workers, args.steps, 32, 32
    dim, blocks, heads, hidden = 64, 4, 1, 64
    torch.set_num_threads(2)

    ctx = mp.get_context("fork")
    pipes, procs = [], []
    for _ in range(W):
        parent, child = ctx.Pipe()
        p = ctx.Process(target=_worker, args=(child,), daemon=True)
        p.start()
        pipes.append(parent)
        procs.append(p)

    model = TorchPolicy(3, dim, blocks, heads, hidden, 2)
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)

    for p in pipes:
        p.send(("reset", None))
    obs = np.stack([p.recv() for p in pipes])

    memory = torch.zeros(W, max_ep, blocks, dim)
    mask_table = torch.tril(torch.ones(L, L, dtype=torch.bool), -1)
    index_table = torch.cat([
        torch.arange(L).repeat(L - 1, 1),
        torch.stack([torch.arange(i, i + L) for i in range(max_ep - L + 1)])])
    e = torch.zeros(W, dtype=torch.long)

    t_start = None
    total_steps = 0
    for update in range(args.updates):
        if update == 1:  # skip warmup for steady-state throughput
            t_start = time.perf_counter()
            total_steps = 0
        buf = {k: [] for k in
               ("obs", "act", "logp", "val", "rew", "done", "mask", "win")}
        for t in range(T):
            with torch.no_grad():
                obs_t = torch.as_tensor(obs)
                mask = mask_table[e.clamp(0, L - 1)]
                window = batched_index_select(memory, index_table[e])
                logits, value, new_mem = model(obs_t, window, mask)
                memory[torch.arange(W), e] = new_mem
                dist = torch.distributions.Categorical(logits=logits)
                act = dist.sample()
                logp = dist.log_prob(act)
            for w, p in enumerate(pipes):
                p.send(("step", act[w].numpy().reshape(1)))
            rews, dones = np.zeros(W, np.float32), np.zeros(W, bool)
            for w, p in enumerate(pipes):
                o, r, d, info = p.recv()
                rews[w], dones[w] = r, d
                if d:
                    pipes[w].send(("reset", None))
                    o = pipes[w].recv()
                    memory[w] = 0
                    e[w] = -1
                obs[w] = o
            for k, v in (("obs", obs_t), ("act", act), ("logp", logp),
                         ("val", value), ("rew", torch.as_tensor(rews)),
                         ("done", torch.as_tensor(dones)), ("mask", mask),
                         ("win", window)):
                buf[k].append(v)
            e += 1
            e[torch.as_tensor(dones)] = 0
            total_steps += W

        # GAE + PPO epochs (4 epochs, 8 minibatches — poc config)
        data = {k: torch.stack(v, 1) for k, v in buf.items()}
        with torch.no_grad():
            adv = torch.zeros(W, T)
            last_adv = torch.zeros(W)
            last_val = data["val"][:, -1]
            not_done = ~data["done"]
            for t in reversed(range(T)):
                last_val = last_val * not_done[:, t]
                last_adv = last_adv * not_done[:, t]
                delta = data["rew"][:, t] + 0.99 * last_val - data["val"][:, t]
                last_adv = delta + 0.99 * 0.95 * last_adv
                adv[:, t] = last_adv
                last_val = data["val"][:, t]
        B = W * T
        flat = {k: v.reshape(B, *v.shape[2:]) for k, v in data.items()}
        flat_adv = adv.reshape(B)
        for _ in range(4):
            perm = torch.randperm(B)
            for start in range(0, B, B // 8):
                idx = perm[start:start + B // 8]
                logits, value, _ = model(flat["obs"][idx], flat["win"][idx],
                                         flat["mask"][idx])
                dist = torch.distributions.Categorical(logits=logits)
                logp = dist.log_prob(flat["act"][idx])
                a = flat_adv[idx]
                a = (a - a.mean()) / (a.std() + 1e-8)
                ratio = torch.exp(logp - flat["logp"][idx])
                pl = torch.min(ratio * a, ratio.clamp(0.8, 1.2) * a).mean()
                ret = flat["val"][idx] + flat_adv[idx]
                vl = torch.max((value - ret) ** 2,
                               ((flat["val"][idx] + (value - flat["val"][idx]
                                 ).clamp(-0.2, 0.2)) - ret) ** 2).mean()
                loss = -(pl - 0.1 * vl + 0.001 * dist.entropy().mean())
                opt.zero_grad()
                loss.backward()
                nn.utils.clip_grad_norm_(model.parameters(), 0.5)
                opt.step()

    elapsed = time.perf_counter() - t_start if t_start else 1.0
    steps_per_sec = total_steps / elapsed
    for p in pipes:
        try:
            p.send(("close", None))
        except Exception:
            pass
    print(json.dumps({"env_steps_per_second": steps_per_sec,
                      "updates_measured": args.updates - 1,
                      "workers": W, "worker_steps": T}))


if __name__ == "__main__":
    main()
