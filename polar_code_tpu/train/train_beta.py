"""Train symmetric β matrices for DL-SCL flip ranking — JAX/optax.

Work-alike of `dl_scl_polar/train/train_beta.py`: loads `.npz` shards by
glob, shuffled train/val split (NumPy `default_rng(seed)`), logits = −Q
(smallest Q = most-likely flip), cross-entropy to the oracle flip index
plus λ·Σ off²/dim² L2, RMSprop (decay 0.99 / eps 1e-8 mirroring torch),
diagonal clamped between steps, per-epoch CSV log
(`epoch,train_loss,train_acc,val_loss,val_acc`) and a best-val-loss β
checkpoint saved as raw `.npy` — the artifact formats are interchangeable
with the reference's.

The train step is one jitted function (forward, CE+L2, grad, RMSprop
update, diagonal clamp); the β matmul batches straight onto the MXU.
"""

from __future__ import annotations

import argparse
import csv
from glob import glob
from pathlib import Path
from typing import Iterable, List, Tuple

import numpy as np

from ..dlscl.beta import SymmetricBeta
from ..utils.seeding import seed_all


def _load_dataset(paths: Iterable[str]) -> Tuple[np.ndarray, np.ndarray]:
    abs_l0_list: List[np.ndarray] = []
    labels: List[np.ndarray] = []
    for pattern in paths:
        matches = sorted(glob(pattern))
        if not matches and Path(pattern).exists():
            matches = [pattern]
        for file_str in matches:
            data = np.load(file_str)
            abs_l0_list.append(data["abs_l0"])
            labels.append(data["flip_idx"])
    if not abs_l0_list:
        raise FileNotFoundError("No dataset shards found for the provided --data patterns")
    return (
        np.concatenate(abs_l0_list, axis=0).astype(np.float32),
        np.concatenate(labels, axis=0).astype(np.int64),
    )


def _split_train_val(
    abs_l0: np.ndarray, labels: np.ndarray, val_frac: float, seed: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    indices = np.arange(abs_l0.shape[0])
    rng.shuffle(indices)
    split = int(indices.size * (1.0 - val_frac))
    tr, va = indices[:split], indices[split:]
    return abs_l0[tr], labels[tr], abs_l0[va], labels[va]


def train_beta(args: argparse.Namespace) -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from ..utils.cache import enable_compilation_cache

    seed_all(args.seed)
    enable_compilation_cache()
    abs_l0, labels = _load_dataset(args.data)
    dim = abs_l0.shape[1]

    x_tr, y_tr, x_va, y_va = _split_train_val(abs_l0, labels, args.val_frac, args.seed)

    model = SymmetricBeta(dim)
    params = model.init(jax.random.key(args.seed))
    params = SymmetricBeta.clamp_diagonal(params)
    # Mirror torch.optim.RMSprop defaults (alpha=0.99, eps=1e-8, no momentum).
    tx = optax.rmsprop(args.lr, decay=0.99, eps=1e-8)
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        logits = -model.apply(params, x)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        l2 = jnp.sum(params["off_diag"] ** 2) / (dim * dim)
        loss = ce + args.lambda_l2 * l2 if args.lambda_l2 > 0 else ce
        acc_count = jnp.sum(jnp.argmax(logits, axis=1) == y)
        return loss, acc_count

    @jax.jit
    def train_step(params, opt_state, x, y):
        (loss, acc_count), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = SymmetricBeta.clamp_diagonal(params)
        return params, opt_state, loss, acc_count

    @jax.jit
    def eval_step(params, x, y):
        loss, acc_count = loss_fn(params, x, y)
        return loss, acc_count

    log_dir = Path(args.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    log_path = log_dir / f"train_M{args.M}.csv"
    checkpoint_dir = Path(args.checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    ckpt_path = checkpoint_dir / f"beta_M{args.M}.npy"

    best_val = float("inf")
    best_beta = None
    shuffle_rng = np.random.default_rng(args.seed + 1)

    def batches(x, y, shuffle):
        order = np.arange(x.shape[0])
        if shuffle:
            shuffle_rng.shuffle(order)
        for start in range(0, order.size, args.batch):
            sel = order[start : start + args.batch]
            yield jnp.asarray(x[sel]), jnp.asarray(y[sel])

    with log_path.open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["epoch", "train_loss", "train_acc", "val_loss", "val_acc"])
        for epoch in range(1, args.epochs + 1):
            # accumulate loss/accuracy as device scalars; one sync per epoch
            # (per-batch host syncs are expensive on remote-attached TPUs)
            loss_parts, acc_parts, total = [], [], 0
            for xb, yb in batches(x_tr, y_tr, shuffle=True):
                params, opt_state, loss, acc_count = train_step(params, opt_state, xb, yb)
                bs = int(xb.shape[0])
                loss_parts.append(loss * bs)
                acc_parts.append(acc_count)
                total += bs
            import jax as _jax

            loss_parts, acc_parts = _jax.device_get((loss_parts, acc_parts))
            train_loss = float(np.sum(loss_parts)) / max(total, 1)
            train_acc = int(np.sum(acc_parts)) / max(total, 1)

            vloss_parts, vacc_parts, val_total = [], [], 0
            for xb, yb in batches(x_va, y_va, shuffle=False):
                loss, acc_count = eval_step(params, xb, yb)
                bs = int(xb.shape[0])
                vloss_parts.append(loss * bs)
                vacc_parts.append(acc_count)
                val_total += bs
            if val_total > 0:
                vloss_parts, vacc_parts = _jax.device_get((vloss_parts, vacc_parts))
                val_loss = float(np.sum(vloss_parts)) / val_total
                val_acc = int(np.sum(vacc_parts)) / val_total
            else:
                val_loss = float("nan")
                val_acc = float("nan")

            writer.writerow([epoch, train_loss, train_acc, val_loss, val_acc])
            f.flush()

            if val_total > 0 and val_loss < best_val:
                best_val = val_loss
                best_beta = np.asarray(SymmetricBeta.beta_matrix(params))
        if best_beta is None:
            best_beta = np.asarray(SymmetricBeta.beta_matrix(params))

    np.save(ckpt_path, best_beta)
    print(f"Saved β checkpoint to {ckpt_path}")


def build_argparser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train symmetric β for DL-SCL")
    parser.add_argument("--M", type=int, required=True, help="SCL list size")
    parser.add_argument("--data", nargs="+", required=True, help="Glob(s) to dataset shards")
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--lambda_l2", type=float, default=0.25)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--val_frac", type=float, default=0.1)
    parser.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    parser.add_argument("--log_dir", type=str, default="logs")
    parser.add_argument("--cpu", action="store_true", help="Accepted for reference-CLI compatibility (JAX picks the backend)")
    return parser


def main(argv: List[str] | None = None) -> None:
    args = build_argparser().parse_args(argv)
    train_beta(args)


if __name__ == "__main__":
    main()
