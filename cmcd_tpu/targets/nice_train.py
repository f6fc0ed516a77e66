"""NICE flow pretrainer CLI.

Reference: src/nice_run.py, which trains NICE on tfds MNIST
(resize -> dequantize -> logit, src/nice_run.py:22-61) and uploads params to
a wandb artifact (with a committed API key at :214 — not replicated).

This environment has no MNIST (offline); the trainer accepts any image
array source: a .npy/.npz file of (N, H, W) or (N, H*W) uint8/float images,
or synthetic data for smoke tests. The preprocessing pipeline is the same:
resize (area-mean pooling) -> dequantize to n_bits -> logit(alpha).
Checkpoints go to a local pickle the nice target loads
(targets/nice.py make_nice).

Run:
  python -m cmcd_tpu.targets.nice_train --data mnist.npz --im_size 14 \
      --epochs 50 --out cmcd_tpu/targets/data/nice_params.pkl
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as onp
import optax

from cmcd_tpu.targets.nice import nice_init, nice_log_prob, save_nice_params


def resize_images(x: onp.ndarray, im_size: int) -> onp.ndarray:
    """Mean-pool square images to (im_size, im_size) (reference uses
    tf.image.resize; area pooling is the offline equivalent)."""
    n, h, w = x.shape
    if h == im_size:
        return x
    import numpy as np

    # Simple bilinear via jax.image for arbitrary ratios.
    return onp.asarray(
        jax.image.resize(jnp.asarray(x), (n, im_size, im_size), method="bilinear")
    )


def dequantize(x, n_bits: int, key):
    """Quantize to n_bits then add uniform noise (src/nice_run.py:44-52)."""
    n_levels = 2.0**n_bits
    x = onp.floor(x / (256.0 / n_levels))
    x = x / n_levels
    noise = jax.random.uniform(key, x.shape, minval=0.0, maxval=1.0 / n_levels)
    return jnp.asarray(x) + noise


def logit_transform(x, alpha: float):
    """x in [0,1] -> logit(alpha + (1 - 2 alpha) x) (src/nice_run.py:55-61)."""
    y = alpha + (1.0 - 2.0 * alpha) * x
    return jnp.log(y) - jnp.log1p(-y)


def load_images(path: str | None, im_size: int, n_synth: int = 4096):
    if path == "digits":
        # sklearn's bundled handwritten-digits set (1797 8x8 images, values
        # 0..16) — the real-image stand-in for MNIST in this offline
        # environment (reference trains on tfds MNIST, src/nice_run.py:22).
        from sklearn.datasets import load_digits

        imgs = load_digits().images.astype(onp.float32) * (255.0 / 16.0)
        return resize_images(imgs, im_size)
    if path is None:
        # Synthetic fallback: smooth random blobs (offline smoke training).
        key = jax.random.PRNGKey(0)
        base = jax.random.normal(key, (n_synth, 8, 8))
        imgs = jax.image.resize(base, (n_synth, im_size, im_size), "bilinear")
        imgs = jax.nn.sigmoid(2.0 * imgs) * 255.0
        return onp.asarray(imgs)
    data = onp.load(path, allow_pickle=True)
    if hasattr(data, "files"):
        x = data[data.files[0]]
    else:
        x = data
    x = onp.asarray(x, onp.float32)
    if x.ndim == 2:
        side = int(onp.sqrt(x.shape[1]))
        x = x.reshape(-1, side, side)
    if x.max() <= 1.0:
        x = x * 255.0
    return resize_images(x, im_size)


def train_nice(
    data_path: str | None = None,
    im_size: int = 14,
    n_bits: int = 3,
    alpha: float = 0.05,
    hidden_dim: int = 1000,
    batch_size: int = 128,
    epochs: int = 10,
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    out_path: str | None = None,
    seed: int = 0,
):
    key = jax.random.PRNGKey(seed)
    imgs = load_images(data_path, im_size)
    key, dq_key = jax.random.split(key)
    x = dequantize(imgs, n_bits, dq_key)
    x = logit_transform(x, alpha).reshape(x.shape[0], -1)
    dim = im_size * im_size

    key, init_key = jax.random.split(key)
    params = nice_init(init_key, dim, h_dim=hidden_dim)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            nll = -jnp.mean(nice_log_prob(p, batch))
            l2 = sum(
                jnp.sum(l["w"] ** 2) for net in p["nets"] for l in net
            )
            return nll + weight_decay * l2

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = x.shape[0]
    steps_per_epoch = max(n // batch_size, 1)
    for epoch in range(epochs):
        key, perm_key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, n)
        t0 = time.time()
        last = None
        for s in range(steps_per_epoch):
            batch = x[perm[s * batch_size : (s + 1) * batch_size]]
            params, opt_state, last = step(params, opt_state, batch)
        print(
            f"epoch {epoch}: nll {float(last):.3f} ({time.time()-t0:.1f}s)",
            flush=True,
        )

    if out_path:
        save_nice_params(params, out_path)
        print("saved to", out_path)
    return params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None, help=".npy/.npz of images; synthetic if omitted")
    p.add_argument("--im_size", type=int, default=14)
    p.add_argument("--n_bits", type=int, default=3)
    p.add_argument("--alpha", type=float, default=0.05)
    p.add_argument("--hidden_dim", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    train_nice(
        data_path=args.data,
        im_size=args.im_size,
        n_bits=args.n_bits,
        alpha=args.alpha,
        hidden_dim=args.hidden_dim,
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        out_path=args.out,
    )


if __name__ == "__main__":
    main()
