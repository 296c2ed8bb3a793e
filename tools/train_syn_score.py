"""Train the SynScore synthesizability ensemble (bagged, fully vmapped).

The reference ships a trained 100-model CGNF ensemble
(/root/reference/rewards/calculators/syn_score/); offline, this trainer
produces the equivalent artifact from first principles: it labels
compositions with the framework's SMACT-style charge-balance test
(chem/validity.smact_valid) — the same screening signal SMACT-based
synthesizability filters use — and fits the 100-model bagged MLP ensemble to
discriminate balanceable from non-balanceable compositions in the
90-dim composition-embedding space SynScore scores with.

TPU-native trick: all 100 bags train SIMULTANEOUSLY — parameters are stacked
[E, ...], each bag gets its own bootstrap index table, and one jitted
update vmaps the forward/backward over the ensemble axis. The reference
trains/loads 100 torch models sequentially.

    python tools/train_syn_score.py [out=matinvent_tpu/rewards/calculators/weights/syn_score.npz]
        [n=20000] [steps=3000] [n_models=100]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from matinvent_tpu.chem.composition import Composition
from matinvent_tpu.chem.data import OXIDATION_STATES, SYMBOLS, Z_BY_SYMBOL
from matinvent_tpu.chem.validity import smact_valid
from matinvent_tpu.rewards.calculators.syn_score import EMB_DIM, HID_DIM, SynScore


def sample_compositions(n: int, seed: int) -> list[Composition]:
    """Decision-boundary-rich corpus; the labeler (smact_valid) decides the
    class. 40% exactly-balanced ionic constructions (guaranteed-ish
    positives), 30% the same with perturbed counts (hard cases straddling
    the boundary), 30% arbitrary multisets (mostly negatives)."""
    from math import gcd

    rng = np.random.default_rng(seed)
    syms = [s for s in SYMBOLS[1:84] if s in Z_BY_SYMBOL]
    cations = [
        (s, [o for o in OXIDATION_STATES.get(s, []) if o > 0])
        for s in syms
        if any(o > 0 for o in OXIDATION_STATES.get(s, []))
    ]
    anions = [
        (s, [o for o in OXIDATION_STATES.get(s, []) if o < 0])
        for s in ("O", "S", "Se", "Te", "F", "Cl", "Br", "I", "N", "P", "As")
        if any(o < 0 for o in OXIDATION_STATES.get(s, []))
    ]

    def balanced_pair():
        cs, cox = cations[rng.integers(len(cations))]
        as_, aox = anions[rng.integers(len(anions))]
        op = int(rng.choice(cox))
        on = -int(rng.choice(aox))
        g = gcd(op, on)
        return cs, as_, on // g, op // g  # n_cat * op == n_an * on

    out = []
    for i in range(n):
        u = rng.random()
        if u < 0.7:
            cs, as_, ncat, nan_ = balanced_pair()
            if u >= 0.4:  # perturb one count: usually breaks the balance
                if rng.random() < 0.5:
                    ncat += int(rng.integers(1, 3))
                else:
                    nan_ += int(rng.integers(1, 3))
            comp = {cs: ncat, as_: nan_}
            if rng.random() < 0.25:  # ternary: add a second balanced pair
                cs2, as2, n2, m2 = balanced_pair()
                comp[cs2] = comp.get(cs2, 0) + n2
                comp[as2] = comp.get(as2, 0) + m2
            out.append(Composition(comp))
        else:
            k = int(rng.integers(1, 5))
            els = list(rng.choice(syms, size=k, replace=False))
            counts = rng.integers(1, 9, size=k)
            out.append(
                Composition({e: int(c) for e, c in zip(els, counts)})
            )
    return out


def main(argv: list[str]) -> None:
    kv = dict(a.split("=", 1) for a in argv if "=" in a)
    out_path = kv.get(
        "out",
        os.path.join(
            "matinvent_tpu", "rewards", "calculators", "weights", "syn_score.npz"
        ),
    )
    n = int(kv.get("n", 20000))
    steps = int(kv.get("steps", 3000))
    E = int(kv.get("n_models", 100))
    seed = int(kv.get("seed", 0))
    lr = float(kv.get("lr", 3e-3))

    comps = sample_compositions(n, seed)
    labels = np.array([1 if smact_valid(c) else 0 for c in comps], np.int32)
    print(f"labeled {n} compositions: {labels.mean():.3f} positive")

    # featurize exactly the way SynScore scores (fallback embeddings)
    scorer = SynScore(root_dir="/tmp/syn_train", n_models=E, seed=seed)

    class _S:  # comp_embedding takes a Structure-like with .composition
        def __init__(self, c):
            self.composition = c

    X = np.stack([scorer.comp_embedding(_S(c)) for c in comps]).astype(np.float32)
    ok = ~np.isnan(X).any(axis=1)
    X, labels = X[ok], labels[ok]
    n = len(X)
    # standardize features (stored in the artifact? no — embeddings are
    # deterministic, so fold the scale into the first layer instead)
    mu, sd = X.mean(0), X.std(0) + 1e-6
    Xs = (X - mu) / sd

    rng = np.random.default_rng(seed)
    n_val = n // 10
    perm = rng.permutation(n)
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    Xtr, ytr = Xs[train_idx], labels[train_idx]
    Xva, yva = Xs[val_idx], labels[val_idx]

    # per-bag bootstrap tables [E, n_train]
    boots = rng.integers(0, len(Xtr), size=(E, len(Xtr)))

    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    params = {
        "w1": jax.random.normal(k1, (E, EMB_DIM, HID_DIM)) * (1 / np.sqrt(EMB_DIM)),
        "b1": jnp.zeros((E, HID_DIM)),
        "w2": jax.random.normal(k2, (E, HID_DIM, 2)) * (1 / np.sqrt(HID_DIM)),
        "b2": jnp.zeros((E, 2)),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    Xtr_j, ytr_j = jnp.asarray(Xtr), jnp.asarray(ytr)
    boots_j = jnp.asarray(boots)
    batch = 512

    def loss_fn(params, idx):
        # idx [E, batch] bootstrap rows per bag
        def one(w1, b1, w2, b2, rows):
            x = Xtr_j[rows]
            y = ytr_j[rows]
            h = jax.nn.softplus(x @ w1 + b1)
            logits = h @ w2 + b2
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(logp[jnp.arange(len(rows)), y])

        losses = jax.vmap(one)(
            params["w1"], params["b1"], params["w2"], params["b2"], idx
        )
        return jnp.mean(losses)

    @jax.jit
    def update(params, opt_state, key):
        cols = jax.random.randint(key, (E, batch), 0, boots_j.shape[1])
        idx = jnp.take_along_axis(boots_j, cols, axis=1)
        loss, grads = jax.value_and_grad(loss_fn)(params, idx)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed + 1)
    for step in range(steps):
        key, sk = jax.random.split(key)
        params, opt_state, loss = update(params, opt_state, sk)
        if step % max(steps // 10, 1) == 0:
            print(f"step {step}/{steps}: loss={float(loss):.4f}")

    # fold standardization into the first layer: x_raw @ (w1/sd) + (b1 - mu/sd@w1)
    w1 = np.asarray(params["w1"]) / sd[None, :, None]
    b1 = np.asarray(params["b1"]) - np.einsum("d,edh->eh", mu / sd, np.asarray(params["w1"]))
    arrays = {
        "w1": w1.astype(np.float32),
        "b1": b1.astype(np.float32),
        "w2": np.asarray(params["w2"], np.float32),
        "b2": np.asarray(params["b2"], np.float32),
    }

    # validation with the folded params through the inference path
    probs = np.asarray(
        SynScore._ensemble_forward(
            {k_: jnp.asarray(v) for k_, v in arrays.items()}, jnp.asarray(X[val_idx])
        )
    )
    pred = (probs >= 0.5).astype(int)
    acc = float((pred == yva).mean())
    # simple AUC via rank statistic
    order = np.argsort(probs)
    ranks = np.empty(len(probs))
    ranks[order] = np.arange(1, len(probs) + 1)
    pos = yva == 1
    auc = (
        (ranks[pos].sum() - pos.sum() * (pos.sum() + 1) / 2)
        / max(pos.sum() * (~pos).sum(), 1)
    )
    print(f"validation: acc={acc:.4f} auc={float(auc):.4f} (n={len(yva)})")

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **arrays)
    meta = os.path.splitext(out_path)[0] + ".meta.txt"
    with open(meta, "w") as fh:
        fh.write(f"val_acc={acc:.5f}\nval_auc={float(auc):.5f}\n"
                 f"n_models={E}\nsteps={steps}\nn_train={len(Xtr)}\n")
    print(f"saved ensemble to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
