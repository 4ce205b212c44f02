"""Real-vs-generated classifier tests (Flax/optax, jitted training loops).

TPU-native counterpart of the reference's torch classifier suite
(`/root/reference/experiments/calo_utils/ugr_evaluation/evaluate.py:40-319` and
`resnet.py`): a LeakyReLU MLP ("DNN") on low/high-level features and a 3-D
ResNet on voxel grids, trained with BCE, model-selected by test accuracy,
isotonic-calibrated, and scored by AUC and JSD. The whole train/eval step is a
single jitted function; data streams through fixed-size batches so each loop
hits one compiled program.

Deviation from the reference: computations run in float32 (the reference sets
torch's default dtype to float64 for evaluation, evaluate.py:28); AUC/JSD are
insensitive at the reported 4 decimals.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit4hep_tpu.utils.logger import LOGGER


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------
class DNN(nn.Module):
    """LeakyReLU MLP emitting one logit (reference evaluate.py:40-65)."""

    num_layer: int
    num_hidden: int
    dropout_probability: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.num_hidden)(x)
        x = nn.leaky_relu(x)
        x = nn.Dropout(self.dropout_probability, deterministic=not train)(x)
        for _ in range(self.num_layer):
            x = nn.Dense(self.num_hidden)(x)
            x = nn.leaky_relu(x)
            x = nn.Dropout(self.dropout_probability, deterministic=not train)(x)
        return nn.Dense(1)(x)


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.planes, (3, 3, 3), strides=self.stride, use_bias=False,
                    padding=((1, 1),) * 3,
                    kernel_init=nn.initializers.he_normal())(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), use_bias=False,
                    padding=((1, 1),) * 3,
                    kernel_init=nn.initializers.he_normal())(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.planes, (1, 1, 1), strides=self.stride,
                               use_bias=False,
                               kernel_init=nn.initializers.he_normal())(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                    kernel_init=nn.initializers.he_normal())(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), strides=self.stride, use_bias=False,
                    padding=((1, 1),) * 3,
                    kernel_init=nn.initializers.he_normal())(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * self.expansion, (1, 1, 1), use_bias=False,
                    kernel_init=nn.initializers.he_normal())(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.planes * self.expansion, (1, 1, 1),
                               strides=self.stride, use_bias=False,
                               kernel_init=nn.initializers.he_normal())(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class ResNet3D(nn.Module):
    """3-D ResNet real/fake voxel classifier (reference resnet.py:96-213).

    Input rows are [log10(Einc), voxels/Einc...]; the energy feature is
    batch-normed and concatenated before the final dense layer.
    """

    stage_sizes: Sequence[int]
    block: Any  # BasicBlock3D | Bottleneck3D
    img_shape: tuple
    inplanes: Sequence[int] = (32, 64, 64, 128)
    n_classes: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        e_inc = nn.BatchNorm(use_running_average=not train, name="e_norm")(x[:, :1])
        v = x[:, 1:].reshape((-1, *self.img_shape, 1))  # NDHWC

        v = nn.Conv(self.inplanes[0], (7, 7, 7), strides=(2, 2, 2), use_bias=False,
                    padding=((3, 3),) * 3,  # torch-symmetric (SAME shifts on even dims)
                    kernel_init=nn.initializers.he_normal(), name="stem")(v)
        v = nn.BatchNorm(use_running_average=not train)(v)
        v = nn.relu(v)
        v = nn.max_pool(v, (3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)

        for stage, (planes, blocks) in enumerate(zip(self.inplanes, self.stage_sizes)):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                v = self.block(planes, stride)(v, train)

        v = v.mean(axis=(1, 2, 3))  # global average pool
        logits = nn.Dense(self.n_classes)(jnp.concatenate([v, e_inc], axis=1))
        return logits


def generate_model(model_depth: int, img_shape=(45, 50, 18), **kwargs) -> ResNet3D:
    """ResNet factory matching the reference depths (resnet.py:215-233)."""
    table = {
        10: (BasicBlock3D, [1, 1, 1, 1]),
        18: (BasicBlock3D, [2, 2, 2, 2]),
        34: (BasicBlock3D, [3, 4, 6, 3]),
        50: (Bottleneck3D, [3, 4, 6, 3]),
        101: (Bottleneck3D, [3, 4, 23, 3]),
        152: (Bottleneck3D, [3, 8, 36, 3]),
        200: (Bottleneck3D, [3, 24, 36, 3]),
    }
    block, stages = table[model_depth]
    return ResNet3D(stage_sizes=stages, block=block, img_shape=tuple(img_shape), **kwargs)


# ---------------------------------------------------------------------------
# data plumbing
# ---------------------------------------------------------------------------
def ttv_split(data1, data2, split=(0.6, 0.2, 0.2), rng=None):
    """Truncate to equal lengths, shuffle, split train/test/val, merge+shuffle
    (reference evaluate.py:142-165)."""
    rng = rng or np.random.default_rng()
    n = min(len(data1), len(data2))
    data1, data2 = np.array(data1[:n]), np.array(data2[:n])
    rng.shuffle(data1)
    rng.shuffle(data2)
    cuts = np.cumsum((n * np.asarray(split)).astype(int))[:-1]
    out = []
    for a, b in zip(np.split(data1, cuts), np.split(data2, cuts)):
        merged = np.concatenate([a, b], axis=0)
        rng.shuffle(merged)
        out.append(merged)
    return tuple(out)


def _batches(data, batch_size, shuffle=False, rng=None):
    idx = np.arange(len(data))
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    for start in range(0, len(data), batch_size):
        yield data[idx[start : start + batch_size]]


# ---------------------------------------------------------------------------
# training / evaluation
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ClassifierConfig:
    lr: float = 2e-4
    batch_size: int = 1000
    n_epochs: int = 50
    optimizer: str = "Adam"
    seed: int = 0


def _bce_with_logits(logits, targets):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits.squeeze(-1), targets))


def train_classifier(model: nn.Module, train_data, test_data, cfg: ClassifierConfig):
    """Train with BCE; keep the params of the best test accuracy; stop early at
    accuracy 1.0 (reference evaluate.py:181-242).

    Returns (best_variables, apply_fn) where apply_fn(data) -> logits.

    TPU-native loop: the train/test arrays ride device memory ONCE and an
    entire epoch runs as one jitted ``lax.scan`` over shuffled batch
    indices — 1 dispatch per epoch instead of one per batch (the reference
    loop re-uploads every batch and dispatches ~8000 programs at ds2
    scale; measured tunnel-transfer-bound on this harness). The shuffle
    permutation (a few hundred KB) is the only per-epoch upload. Ragged
    tails wrap around the permutation so every batch is full — a handful
    of samples repeat within an epoch, immaterial at classifier scale
    (the streaming fallback below keeps the exact ragged semantics for
    datasets too big to sit in HBM)."""
    nbytes = np.asarray(train_data).nbytes + np.asarray(test_data).nbytes
    if nbytes > 8 * 1024**3:
        return _train_classifier_streaming(model, train_data, test_data, cfg)

    key = jax.random.PRNGKey(cfg.seed)
    x0 = jnp.asarray(train_data[: min(2, len(train_data)), :-1], jnp.float32)
    variables = model.init(key, x0, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = (optax.adamw(cfg.lr) if cfg.optimizer == "AdamW" else optax.adam(cfg.lr))
    opt_state = tx.init(params)
    has_bn = bool(batch_stats)

    n, bs = len(train_data), int(cfg.batch_size)
    steps = max(1, -(-n // bs))
    train_dev = jnp.asarray(train_data, jnp.float32)
    test_dev = jnp.asarray(test_data, jnp.float32)

    def loss_and_logits(p, b_stats, x, y, rng):
        vars_in = {"params": p, **({"batch_stats": b_stats} if has_bn else {})}
        out = model.apply(
            vars_in, x, train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"] if has_bn else [],
        )
        logits, new_vars = out if has_bn else (out[0], {})
        return _bce_with_logits(logits, y), (logits, new_vars)

    @jax.jit
    def train_epoch(data, params, batch_stats, opt_state, perm, rng):
        # perm: (steps * bs,) int32 — shuffled sample ids, tail wrapped.
        # `data` is an explicit argument (NOT a closure capture: captured
        # device arrays are embedded as multi-GB lowering constants)
        def body(carry, sc):
            params, batch_stats, opt_state, correct = carry
            ids, i = sc
            batch = jnp.take(data, ids, axis=0)
            x, y = batch[:, :-1], batch[:, -1]
            (loss, (logits, new_vars)), grads = jax.value_and_grad(
                loss_and_logits, has_aux=True
            )(params, batch_stats, x, y, jax.random.fold_in(rng, i))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_bs = new_vars.get("batch_stats", batch_stats)
            correct += jnp.sum((logits.squeeze(-1) > 0) == (y > 0.5))
            return (params, new_bs, opt_state, correct), loss

        (params, batch_stats, opt_state, correct), losses = jax.lax.scan(
            body,
            (params, batch_stats, opt_state, jnp.zeros((), jnp.int32)),
            (perm.reshape(steps, bs), jnp.arange(steps)),
        )
        return params, batch_stats, opt_state, correct, losses[-1]

    @jax.jit
    def _infer_batches(batches, params, batch_stats):
        vars_in = {"params": params,
                   **({"batch_stats": batch_stats} if has_bn else {})}

        def body(_, x):
            return None, model.apply(vars_in, x[:, :-1], train=False
                                     ).squeeze(-1)

        _, logits = jax.lax.scan(body, None, batches)
        return logits.reshape(-1)

    def make_infer(data_dev):
        m = data_dev.shape[0]
        m_steps = max(1, -(-m // bs))
        pad = m_steps * bs - m
        batches = jnp.pad(data_dev, ((0, pad), (0, 0))).reshape(m_steps, bs, -1)
        return lambda params, batch_stats: _infer_batches(
            batches, params, batch_stats)[:m]

    infer_test = make_infer(test_dev)

    rng_np = np.random.default_rng(cfg.seed)
    best = {"acc": -np.inf, "params": params, "batch_stats": batch_stats}
    for epoch in range(cfg.n_epochs):
        perm = rng_np.permutation(n)
        if steps * bs > n:  # wrap the ragged tail to a full batch (tile:
            # tiny datasets can be smaller than one batch)
            perm = np.tile(perm, -(-(steps * bs) // n))[: steps * bs]
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, correct, loss = train_epoch(
            train_dev, params, batch_stats, opt_state,
            jnp.asarray(perm, jnp.int32), sub,
        )
        test_logits = np.asarray(infer_test(params, batch_stats))
        test_acc = float(np.mean((test_logits > 0) == (test_data[:, -1] > 0.5)))
        LOGGER.info(
            f"classifier epoch {epoch + 1}/{cfg.n_epochs}: "
            f"train acc {int(correct) / (steps * bs):.4f}, "
            f"test acc {test_acc:.4f}, loss {float(loss):.4f}"
        )
        if test_acc > best["acc"]:
            best = {"acc": test_acc, "params": params, "batch_stats": batch_stats}
        if test_acc == 1.0:
            break

    def apply_fn(data):
        infer = make_infer(jnp.asarray(np.asarray(data), jnp.float32))
        return np.asarray(infer(best["params"], best["batch_stats"]))

    return best, apply_fn


def _train_classifier_streaming(model: nn.Module, train_data, test_data,
                                cfg: ClassifierConfig):
    """Host-streaming fallback (one dispatch + upload per batch) for
    datasets too large to sit in device memory; exact ragged-batch
    semantics of the original loop."""
    key = jax.random.PRNGKey(cfg.seed)
    x0 = jnp.asarray(train_data[: min(2, len(train_data)), :-1], jnp.float32)
    variables = model.init(key, x0, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = (optax.adamw(cfg.lr) if cfg.optimizer == "AdamW" else optax.adam(cfg.lr))
    opt_state = tx.init(params)
    has_bn = bool(batch_stats)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, rng):
        def loss_fn(p):
            vars_in = {"params": p, **({"batch_stats": batch_stats} if has_bn else {})}
            out = model.apply(
                vars_in, x, train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"] if has_bn else [],
            )
            logits, new_vars = out if has_bn else (out[0], {})
            return _bce_with_logits(logits, y), (logits, new_vars)

        (loss, (logits, new_vars)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_bs = new_vars.get("batch_stats", batch_stats)
        correct = jnp.sum((logits.squeeze(-1) > 0) == (y > 0.5))
        return params, new_bs, opt_state, loss, correct

    @jax.jit
    def infer_step(params, batch_stats, x):
        vars_in = {"params": params, **({"batch_stats": batch_stats} if has_bn else {})}
        return model.apply(vars_in, x, train=False).squeeze(-1)

    def predict(params, batch_stats, data):
        logits = []
        for batch in _batches(data, cfg.batch_size):
            logits.append(np.asarray(
                infer_step(params, batch_stats, jnp.asarray(batch[:, :-1], jnp.float32))
            ))
        return np.concatenate(logits)

    rng_np = np.random.default_rng(cfg.seed)
    best = {"acc": -np.inf, "params": params, "batch_stats": batch_stats}
    for epoch in range(cfg.n_epochs):
        correct, seen = 0, 0
        for i, batch in enumerate(_batches(train_data, cfg.batch_size, shuffle=True, rng=rng_np)):
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss, c = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(batch[:, :-1], jnp.float32),
                jnp.asarray(batch[:, -1], jnp.float32),
                sub,
            )
            correct += int(c)
            seen += len(batch)
        test_logits = predict(params, batch_stats, test_data)
        test_acc = float(np.mean((test_logits > 0) == (test_data[:, -1] > 0.5)))
        LOGGER.info(
            f"classifier epoch {epoch + 1}/{cfg.n_epochs}: "
            f"train acc {correct / max(seen, 1):.4f}, test acc {test_acc:.4f}, "
            f"loss {float(loss):.4f}"
        )
        if test_acc > best["acc"]:
            best = {"acc": test_acc, "params": params, "batch_stats": batch_stats}
        if test_acc == 1.0:
            break

    def apply_fn(data):
        return predict(best["params"], best["batch_stats"], data)

    return best, apply_fn


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def evaluate_classifier(apply_fn, val_data, calibration_data=None, final_eval=False):
    """Accuracy/AUC/JSD of the classifier; with ``final_eval`` the scores are
    isotonic-calibrated on held-out data first (reference evaluate.py:244-319).
    JSD = 1 - BCE/log(2), so JSD -> 0 means indistinguishable samples.
    """
    from sklearn.calibration import calibration_curve
    from sklearn.isotonic import IsotonicRegression
    from sklearn.metrics import accuracy_score, roc_auc_score

    y_true = val_data[:, -1]
    probs = _sigmoid(apply_fn(val_data))
    acc = accuracy_score(y_true, np.round(probs))
    auc = roc_auc_score(y_true, probs)
    eps = 1e-12
    bce = -np.mean(y_true * np.log(probs + eps) + (1 - y_true) * np.log(1 - probs + eps))
    jsd = (-bce + np.log(2.0)) / np.log(2.0)
    LOGGER.info(f"classifier eval: acc {acc:.4f}, AUC {auc:.4f}, JSD {jsd:.4f}")

    if final_eval:
        assert calibration_data is not None, "Need calibration data for calibration!"
        cal_probs = _sigmoid(apply_fn(calibration_data))
        iso = IsotonicRegression(out_of_bounds="clip", y_min=1e-6, y_max=1 - 1e-6).fit(
            cal_probs, calibration_data[:, -1]
        )
        rescaled = iso.predict(probs)
        acc = accuracy_score(y_true, np.round(rescaled))
        auc = roc_auc_score(y_true, rescaled)
        bce = -np.mean(
            y_true * np.log(rescaled + eps) + (1 - y_true) * np.log(1 - rescaled + eps)
        )
        jsd = (-bce + np.log(2.0)) / np.log(2.0)
        prob_true, prob_pred = calibration_curve(y_true, rescaled, n_bins=10)
        LOGGER.info(f"rescaled calibration curve: {prob_true} {prob_pred}")
        LOGGER.info(f"classifier final (calibrated): acc {acc:.4f}, AUC {auc:.4f}, JSD {jsd:.4f}")
    return acc, auc, jsd


def run_dnn_classifier(labeled_a, labeled_b, ev, out_path):
    """Shared DNN real-vs-fake test: ttv-split two pre-labeled feature arrays
    (last column = label, polarity chosen by the caller), train, isotonic-
    calibrate, and append the AUC/JSD line to ``out_path``.

    One copy of the flow used by the CaloGAN low-level, u-space, and
    CaloHadronic feature classifiers. Returns (acc, auc, jsd)."""
    train_data, test_data, val_data = ttv_split(labeled_a, labeled_b)
    model = DNN(
        num_layer=int(ev.eval_cls_n_layer),
        num_hidden=int(ev.eval_cls_n_hidden),
        dropout_probability=float(ev.eval_cls_dropout),
    )
    cls_cfg = ClassifierConfig(
        lr=float(ev.eval_cls_lr),
        batch_size=int(ev.eval_cls_batch_size),
        n_epochs=int(ev.eval_cls_n_epochs),
    )
    _, apply_fn = train_classifier(model, train_data, test_data, cls_cfg)
    acc, auc, jsd = evaluate_classifier(
        apply_fn, val_data, calibration_data=test_data, final_eval=True
    )
    LOGGER.info("Final result of classifier test (AUC / JSD):")
    LOGGER.info(f"{auc:.4f} / {jsd:.4f}")
    import os

    with open(out_path, "a", encoding="utf-8") as f:
        f.write(f"Final result of classifier test (AUC / JSD):\n{auc:.4f} / {jsd:.4f}\n\n")
    return acc, auc, jsd
