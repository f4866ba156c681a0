"""Visualization utilities.

Reference parity targets:
- classification sample grids               utils.py:686-777 show_classification_with_images
- per-unit top-k activating-sample grids    utils.py:1496-1784 show_top_k_samples
- feature visualization of the SAE-spliced  utils.py:1892-1932 (lucent render_vis;
  model                                      lucent is CUDA/torch — replaced by a
                                             JAX-native gradient-ascent optimizer)
- extraction of activating images from      utils.py:2367-2445
  ImageNet tar shards
"""

from __future__ import annotations

import math
import os
import tarfile
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _to_display(img: np.ndarray) -> np.ndarray:
    """Normalize any float image to [0, 1] for display."""
    img = np.asarray(img, np.float32)
    lo, hi = float(img.min()), float(img.max())
    if hi - lo < 1e-12:
        return np.zeros_like(img)
    return (img - lo) / (hi - lo)


def _imshow(ax, img: np.ndarray):
    img = _to_display(img)
    if img.ndim == 3 and img.shape[-1] == 1:
        ax.imshow(img[..., 0], cmap="gray")
    else:
        ax.imshow(img)
    ax.axis("off")


def show_classification_with_images(
    images: np.ndarray,
    labels: np.ndarray,
    logits: np.ndarray,
    category_names: Sequence[str],
    path: str,
    n: int = 10,
) -> str:
    """Grid of the first n samples titled 'pred (true)', green when correct
    (reference utils.py:686-777, simplified styling)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(n, images.shape[0])
    cols = min(5, n)
    rows = math.ceil(n / cols)
    fig, axs = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows), squeeze=False)
    preds = np.argmax(np.asarray(logits), axis=1)
    for i in range(rows * cols):
        ax = axs[i // cols][i % cols]
        if i >= n:
            ax.axis("off")
            continue
        _imshow(ax, images[i])
        ok = preds[i] == labels[i]
        ax.set_title(
            f"{category_names[preds[i]]} ({category_names[labels[i]]})",
            color="green" if ok else "red", fontsize=9,
        )
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def show_top_k_samples(
    images_by_unit: dict,  # unit -> [k, H, W, C] images (already gathered)
    values_by_unit: dict,  # unit -> [k] activation values
    path: str,
    title: str = "Top-k activating samples",
) -> str:
    """One row per unit, k images per row annotated with their activation value
    (reference utils.py:1496-1784, the essential content without W&B tables)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    units = [u for u in images_by_unit if len(images_by_unit[u])]
    if not units:  # every requested unit was dead / sentinel-only
        import matplotlib.pyplot as plt  # noqa: F811

        fig = plt.figure()
        fig.suptitle(f"{title} (no activating samples)")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fig.savefig(path, dpi=150)
        plt.close(fig)
        return path
    # a unit may have FEWER images than values (sentinels dropped by
    # gather_topk_images); bound every cell by the images actually present
    k = max(min(len(values_by_unit[u]), len(images_by_unit[u])) for u in units)
    fig, axs = plt.subplots(len(units), k, figsize=(2 * k, 2.2 * len(units)),
                            squeeze=False)
    for r, u in enumerate(units):
        n_u = min(len(values_by_unit[u]), len(images_by_unit[u]))
        for c in range(k):
            ax = axs[r][c]
            if c >= n_u:
                ax.axis("off")
                continue
            _imshow(ax, images_by_unit[u][c])
            ax.set_title(f"u{u}: {float(values_by_unit[u][c]):.3f}", fontsize=8)
    fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def gather_topk_images(dataset, topk_indices: np.ndarray, units: Sequence[int]) -> dict:
    """Fetch the images behind a TopKState's dataset indices for selected units.
    Sentinel (-1) entries are dropped; a unit with no real entries (dead unit, or
    fewer samples than k) yields an empty [0, H, W, C] array.

    Works with every dataset kind: in-memory arrays (``.images``), lazy files
    (``.paths`` + ``.decode_fn``), and tar shards (``.get_image`` random access)."""
    from sparse_vision_tpu.data.datasets import fetch_images

    sample = fetch_images(dataset, [0])[0]
    out = {}
    for u in units:
        idx = [int(i) for i in topk_indices[:, u] if int(i) >= 0]
        if not idx:
            out[u] = np.empty((0,) + sample.shape, sample.dtype)
        else:
            out[u] = fetch_images(dataset, idx)
    return out


# ---------------------------------------------------------------------------
# feature visualization (lucent replacement): FFT-parametrized ascent with
# color decorrelation + transform robustness (the lucid/lucent recipe the
# reference renders with, utils.py:1892-1932); pixel-space ascent kept as a
# fallback mode
# ---------------------------------------------------------------------------

# empirical ImageNet color-correlation Cholesky-ish factor (the lucid
# color_correlation_svd_sqrt constant; decorrelating the color channels is
# half of what makes ImageNet-scale feature viz legible)
_COLOR_CORR_SVD_SQRT = np.asarray(
    [[0.26, 0.09, 0.02],
     [0.27, 0.00, -0.05],
     [0.27, -0.09, 0.03]], np.float32
)
_COLOR_CORR_NORM = _COLOR_CORR_SVD_SQRT / np.max(
    np.linalg.norm(_COLOR_CORR_SVD_SQRT, axis=0)
)


def _irfft2_dft_mats(h: int, w: int):
    """DFT matrices for an explicit inverse real 2-D FFT (f32 numpy, so they
    bake into the jitted render as constants).

    ``jnp.fft`` has no lowering on this TPU runtime (UNIMPLEMENTED — measured,
    round-5 flagship viz), and the render sizes are tiny (h, w <= ~300), so
    the exact DFT-matrix contraction is both portable and MXU-friendly:
    irfft2 = ifft over rows (complex matmul, split into real parts) then
    irfft over columns (cos/sin matmuls with the Hermitian-fold weights —
    a_f = 2/w for strictly-interior frequencies, 1/w at f=0 and the w-even
    Nyquist bin, where sin == 0 also discards Im exactly like numpy does)."""
    y = np.arange(h, dtype=np.float64)[:, None]
    k = np.arange(h, dtype=np.float64)[None, :]
    ang_h = 2.0 * np.pi * y * k / h
    fr = (np.cos(ang_h) / h).astype(np.float32)  # [h(y), h(k)]
    fi = (np.sin(ang_h) / h).astype(np.float32)
    wf = w // 2 + 1
    f = np.arange(wf, dtype=np.float64)[:, None]
    x = np.arange(w, dtype=np.float64)[None, :]
    a = np.full((wf, 1), 2.0 / w)
    a[0, 0] = 1.0 / w
    if w % 2 == 0:
        a[-1, 0] = 1.0 / w
    ang_w = 2.0 * np.pi * f * x / w
    cw = (a * np.cos(ang_w)).astype(np.float32)  # [wf(f), w(x)]
    sw = (a * np.sin(ang_w)).astype(np.float32)
    return fr, fi, cw, sw


def _fft_param_image(spectrum: jax.Array, scale: jax.Array,
                     h: int, w: int) -> jax.Array:
    """[2, C, h, w//2+1] real/imag spectrum params -> [h, w, C] image values.

    The per-frequency ``scale`` (~1/f) makes the optimizer's steps isotropic in
    IMAGE space rather than frequency space, which kills the checkerboard/
    high-frequency attractors of pixel ascent."""
    spec_r = spectrum[0] * scale  # [C, h, w//2+1]
    spec_i = spectrum[1] * scale
    fr, fi, cw, sw = _irfft2_dft_mats(h, w)
    # ifft over the row axis: X = F @ S with F = fr + i*fi, S = spec_r + i*spec_i
    x_r = jnp.einsum("yk,ckf->cyf", fr, spec_r) - jnp.einsum(
        "yk,ckf->cyf", fi, spec_i)
    x_i = jnp.einsum("yk,ckf->cyf", fr, spec_i) + jnp.einsum(
        "yk,ckf->cyf", fi, spec_r)
    # irfft over the column axis: out = Re(X) @ cw - Im(X) @ sw
    img = jnp.einsum("cyf,fx->cyx", x_r, cw) - jnp.einsum(
        "cyf,fx->cyx", x_i, sw)  # [C, h, w]
    return jnp.transpose(img, (1, 2, 0)) / 4.0  # lucid's magic display scale


def _decorrelate_colors(img: jax.Array) -> jax.Array:
    if img.shape[-1] != 3:
        return img  # grayscale / non-RGB: nothing to decorrelate
    return img @ jnp.asarray(_COLOR_CORR_NORM).T


def _affine_resample(img: jax.Array, shift: jax.Array, zoom: jax.Array,
                     angle: jax.Array) -> jax.Array:
    """Jointly jitter/scale/rotate [h, w, C] with one bilinear resample
    (map_coordinates keeps shapes static under traced transform scalars)."""
    h, w, _ = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    ys = (ca * (yy - cy) - sa * (xx - cx)) / zoom + cy + shift[0]
    xs = (sa * (yy - cy) + ca * (xx - cx)) / zoom + cx + shift[1]

    def one_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [ys, xs], order=1, mode="wrap"
        )

    return jnp.stack([one_channel(img[..., c]) for c in range(img.shape[-1])],
                     axis=-1)


def feature_visualization(
    net,
    params: dict,
    layer: str,
    unit: int,
    img_size: tuple,
    state: Optional[dict] = None,
    splice: Optional[tuple] = None,
    steps: int = 256,
    lr: float = 0.05,
    jitter: int = 4,
    l2_reg: float = 1e-4,
    seed: int = 0,
    mode: str = "fft",
    to_model=None,
    decay_power: float = 1.0,
    max_zoom: float = 0.05,
    max_rotate_deg: float = 5.0,
) -> np.ndarray:
    """Optimize an input image to maximize one unit's (spatial-mean) activation at
    ``layer`` — optionally of the SAE-SPLICED model, which is how the reference
    visualizes SAE features (utils.py:1892-1932 renders the spliced model with lucent).

    ``mode='fft'`` (default) is the lucent render_vis recipe rebuilt in JAX:
    a 1/f-scaled FFT parametrization, ImageNet color decorrelation, sigmoid to
    [0, 1], and per-step transform robustness (random jitter + scale + small
    rotation in one bilinear resample) — the combination that keeps ImageNet-
    scale renders legible instead of adversarial-noise-like. Returns the
    DISPLAY image in [0, 1]; pass ``to_model`` (e.g. ``lambda x: x * 255 - 117``
    for the InceptionV1 convention, or the ViT/CLIP normalizations in
    data/datasets.py) to map it into the network's input domain each step.

    ``mode='pixel'`` is the previous raw-pixel Adam ascent (jitter only) and
    returns the optimized MODEL-DOMAIN input unchanged.
    """
    import optax

    if mode not in ("fft", "pixel"):
        raise ValueError(f"mode must be 'fft' or 'pixel', got {mode!r}")
    key = jax.random.key(seed)
    h, w, c = tuple(img_size)
    tx = optax.adam(lr)

    if mode == "pixel":
        x0 = 0.1 * jax.random.normal(key, (1, h, w, c))
        opt_state = tx.init(x0)

        def objective(x, shift):
            x = jnp.roll(x, shift=(shift[0], shift[1]), axis=(1, 2))
            _, taps, _ = net.apply(params, x, state=state, splice=splice,
                                   stop_at=layer)
            target = taps[layer][..., unit]
            return -jnp.mean(target) + l2_reg * jnp.mean(jnp.square(x))

        @jax.jit
        def step(x, opt_state, key):
            key, sub = jax.random.split(key)
            shift = jax.random.randint(sub, (2,), -jitter, jitter + 1)
            loss, g = jax.value_and_grad(objective)(x, shift)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(x, updates), opt_state, key, loss

        x = x0
        for _ in range(steps):
            x, opt_state, key, _ = step(x, opt_state, key)
        return np.asarray(x[0])

    # ---- FFT mode -------------------------------------------------------------
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    freqs = np.sqrt(fx * fx + fy * fy)
    scale = (1.0 / np.maximum(freqs, 1.0 / max(h, w)) ** decay_power
             * np.sqrt(h * w)).astype(np.float32)
    scale_j = jnp.asarray(scale)
    spectrum0 = 0.01 * jax.random.normal(key, (2, c, h, w // 2 + 1))
    opt_state = tx.init(spectrum0)
    to_model_fn = to_model if to_model is not None else (lambda img: img)

    def render(spectrum):
        img = _fft_param_image(spectrum, scale_j, h, w)
        img = _decorrelate_colors(img)
        return jax.nn.sigmoid(img)  # display image in [0, 1]

    def objective(spectrum, shift, zoom, angle):
        img = render(spectrum)
        img = _affine_resample(img, shift, zoom, angle)
        x = to_model_fn(img)[None]
        _, taps, _ = net.apply(params, x, state=state, splice=splice,
                               stop_at=layer)
        target = taps[layer][..., unit]
        return -jnp.mean(target) + l2_reg * jnp.mean(jnp.square(img))

    @jax.jit
    def step(spectrum, opt_state, key):
        key, k1, k2, k3 = jax.random.split(key, 4)
        shift = jax.random.uniform(k1, (2,), minval=-jitter, maxval=jitter)
        zoom = 1.0 + jax.random.uniform(k2, (), minval=-max_zoom, maxval=max_zoom)
        angle = jax.random.uniform(
            k3, (), minval=-max_rotate_deg, maxval=max_rotate_deg
        ) * (math.pi / 180.0)
        loss, g = jax.value_and_grad(objective)(spectrum, shift, zoom, angle)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(spectrum, updates), opt_state, key, loss

    spectrum = spectrum0
    for _ in range(steps):
        spectrum, opt_state, key, _ = step(spectrum, opt_state, key)
    return np.asarray(render(spectrum))


# ---------------------------------------------------------------------------
# tar extraction (reference utils.py:2367-2445 pulls the activating images out of
# ImageNet webdataset shards into flat folders)
# ---------------------------------------------------------------------------

def extract_images_from_tars(
    tar_paths: Sequence[str],
    wanted_names: Sequence[str],
    output_dir: str,
) -> list[str]:
    """Extract members whose basename matches ``wanted_names`` from tar shards into a
    flat ``output_dir`` (skipping files that already exist, like the reference)."""
    os.makedirs(output_dir, exist_ok=True)
    wanted = set(wanted_names)
    extracted = []
    for tp in tar_paths:
        with tarfile.open(tp) as tf:
            for member in tf.getmembers():
                base = os.path.basename(member.name)
                if base not in wanted and os.path.splitext(base)[0] not in wanted:
                    continue
                dest = os.path.join(output_dir, base)
                if os.path.exists(dest):
                    continue
                src = tf.extractfile(member)
                if src is None:
                    continue
                with open(dest, "wb") as out:
                    out.write(src.read())
                extracted.append(dest)
    return extracted
