"""On-device linear probes: closed-form ridge + L-BFGS multinomial logistic.

JAX-native replacement for the sklearn probe fits the reference runs every
``verbose_iters`` during pretraining (reference ``utils/pretrain_fns.py:52-159``:
``LogisticRegression(C=0.01)`` accuracy and ``ElasticNet(alpha=1e-4,
l1_ratio=0.9)`` R² on frozen embeddings, 80/20 split). Both fits here are
jit-compiled and run on the accelerator, so the periodic probe no longer
stalls the training host for a host-side sklearn fit.

Parity notes (tolerance-tested against sklearn in ``tests/test_probe_jax.py``):

- classifier: same objective as sklearn's lbfgs multinomial solver —
  ``0.5·||w||² + C·Σ logloss`` with an unpenalized intercept — optimized with
  ``optax.lbfgs``; accuracies agree to ~1e-3 at C=0.01 (strongly convex).
- regressor: the reference's ElasticNet at alpha=1e-4/l1_ratio=0.9 is nearly
  unregularized; a closed-form ridge at the matched L2 strength
  (``alpha·(1−l1_ratio)·n``) reproduces its R² within tolerance. The L1 part
  has no closed form and at 1e-5 effective strength does not move R².
- the 80/20 split replicates ``train_test_split(random_state=42)`` index
  selection exactly (``RandomState(42).permutation``), so parity tests
  compare like for like.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


def split_indices(n: int, test_size: float = 0.2, seed: int = 42):
    """Replicate sklearn ``train_test_split`` index selection: a
    ``RandomState(seed)`` permutation, first ``n_test`` entries are test."""
    n_test = int(np.ceil(n * test_size))
    perm = np.random.RandomState(seed).permutation(n)
    return perm[n_test:], perm[:n_test]


def standardize(x: jnp.ndarray) -> jnp.ndarray:
    """Feature-wise zero-mean/unit-std (sklearn ``StandardScaler`` semantics:
    population std, zero-variance features left centred)."""
    mean = x.mean(axis=0, keepdims=True)
    std = x.std(axis=0, keepdims=True)
    return (x - mean) / jnp.where(std == 0.0, 1.0, std)


# ----------------------------------------------------------------------
# Ridge regression (closed form)
# ----------------------------------------------------------------------

@partial(jax.jit, static_argnames=())
def _ridge_solve(x: jnp.ndarray, y: jnp.ndarray, l2: jnp.ndarray):
    """Solve min ||Xw + b − y||² + l2·||w||² with unpenalized intercept.

    Centring removes the intercept from the normal equations; the Gram matrix
    (F×F) stays on device and the solve is a single Cholesky.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x_mean = x.mean(axis=0)
    y_mean = y.mean()
    xc = x - x_mean
    yc = y - y_mean
    gram = xc.T @ xc + l2 * jnp.eye(x.shape[1], dtype=jnp.float32)
    w = jax.scipy.linalg.solve(gram, xc.T @ yc, assume_a="pos")
    b = y_mean - x_mean @ w
    return w, b


def ridge_fit(x, y, alpha: float = 1e-4, l1_ratio: float = 0.9):
    """Closed-form ridge matched to sklearn ``ElasticNet(alpha, l1_ratio)``'s
    L2 term: sklearn's objective is ``(1/2n)·||Xw−y||² + alpha·l1_ratio·||w||₁
    + 0.5·alpha·(1−l1_ratio)·||w||²``, so the equivalent ridge strength in the
    un-normalized least-squares form is ``alpha·(1−l1_ratio)·n``."""
    n = x.shape[0]
    l2 = jnp.float32(alpha * (1.0 - l1_ratio) * n)
    return _ridge_solve(jnp.asarray(x), jnp.asarray(y), l2)


def r2_score_jax(y_true, y_pred) -> jnp.ndarray:
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - y_true.mean()) ** 2)
    return 1.0 - ss_res / ss_tot


# ----------------------------------------------------------------------
# Multinomial logistic regression (L-BFGS)
# ----------------------------------------------------------------------

def _logistic_loss(params, x, y_onehot, inv_cn):
    """sklearn objective scaled by 1/(C·n): mean logloss + ||w||²/(2Cn).
    Intercept unpenalized (sklearn default)."""
    w, b = params
    logits = x @ w + b
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.mean(jnp.sum(y_onehot * logp, axis=-1))
    return nll + 0.5 * inv_cn * jnp.sum(w * w)


@partial(jax.jit, static_argnames=("n_classes", "max_steps"))
def _logistic_solve(x, y, n_classes: int, c: jnp.ndarray, max_steps: int):
    x = x.astype(jnp.float32)
    y_onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32)
    inv_cn = 1.0 / (c * x.shape[0])
    loss_fn = partial(_logistic_loss, x=x, y_onehot=y_onehot, inv_cn=inv_cn)

    params = (
        jnp.zeros((x.shape[1], n_classes), jnp.float32),
        jnp.zeros((n_classes,), jnp.float32),
    )
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        return (params, state), value

    (params, _), values = jax.lax.scan(
        step, (params, opt.init(params)), None, length=max_steps
    )
    return params, values


def logistic_fit(x, y, n_classes: int, c: float = 0.01, max_steps: int = 100):
    """Fit multinomial logistic regression on device; returns (w, b)."""
    params, _ = _logistic_solve(
        jnp.asarray(x), jnp.asarray(y), n_classes, jnp.float32(c), max_steps
    )
    return params


def logistic_predict(params, x) -> jnp.ndarray:
    w, b = params
    return jnp.argmax(jnp.asarray(x, jnp.float32) @ w + b, axis=-1)


# ----------------------------------------------------------------------
# Probe entry points (same metric names as the sklearn path)
# ----------------------------------------------------------------------

def probe_classification(x, y, c: float = 0.01, seed: int = 42) -> dict[str, float]:
    """80/20 split + on-device logistic fit; returns train/val accuracy."""
    x = standardize(jnp.asarray(x))
    y = jnp.asarray(np.asarray(y), jnp.int32)
    tr, te = split_indices(x.shape[0], seed=seed)
    n_classes = int(np.asarray(jnp.max(y))) + 1
    params = logistic_fit(x[tr], y[tr], n_classes, c=c)
    acc_tr = jnp.mean(logistic_predict(params, x[tr]) == y[tr])
    acc_te = jnp.mean(logistic_predict(params, x[te]) == y[te])
    return {"train_lp_acc": float(acc_tr), "val_lp_acc": float(acc_te)}


def probe_regression(
    x, y, alpha: float = 1e-4, l1_ratio: float = 0.9, seed: int = 42
) -> dict[str, float]:
    """80/20 split + closed-form ridge; returns train/val R²."""
    x = standardize(jnp.asarray(x))
    y = jnp.asarray(np.asarray(y), jnp.float32)
    tr, te = split_indices(x.shape[0], seed=seed)
    w, b = ridge_fit(x[tr], y[tr], alpha=alpha, l1_ratio=l1_ratio)
    r2_tr = r2_score_jax(y[tr], x[tr] @ w + b)
    r2_te = r2_score_jax(y[te], x[te] @ w + b)
    return {"train_lp_r2": float(r2_tr), "val_lp_r2": float(r2_te)}
