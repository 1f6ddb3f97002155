"""NN primitives for the speaker-verification model zoo.

Behavioral contract follows the reference primitive library
(/root/reference/tensorflow/models/models.py):

* ``conv2d``            -- bias-free NHWC conv, grouped via kernel shape
                           [kh, kw, in/groups, out], variance-scaling init
                           (models.py:173-203).
* ``BatchNorm``         -- affine-free (center=False, scale=False), momentum
                           0.997, eps 1e-5 (models.py:62-67).
* ``fixed_padding``     -- explicit (k-1)//2 / rest padding for strided convs
                           (models.py:107-152).
* ``stats_pool``        -- mean || sqrt(var + 1e-5) over the time axis
                           (models.py:262-269), extended here with an optional
                           frame-validity mask for padded/batched extraction.
* ``att_stats_pool``    -- 2-layer 1x1-conv tanh attention over [x; mu; sigma],
                           softmax over time, weighted mean/std
                           (models.py:273-303), also mask-aware.
* ``dense``             -- bias-free (models.py:306-309).
* ``squeeze_excitation``-- models.py:313-326.
* ``gelu``/``mish``     -- models.py:58-59, tdnn_model.py:89-90.
* ``layer_norm``        -- parameterless, eps 1e-5 (models.py:84-104).

TPU-first design notes:
  - All activations flow NHWC; convs lower to XLA ``conv_general_dilated``
    which tiles onto the MXU.  Params are fp32, compute dtype is configurable
    (bf16 by default in training).
  - Pooling statistics are always computed in fp32: the time reduction over
    hundreds of frames is precision-critical and cheap.
  - Masked pooling replaces the reference's batch-1 dynamic-shape inference
    (tf_extract.py:96-111) with static padded batches -- no recompiles.
  - Every kernel param is named ``kernel`` so the l2 regularization sweep in
    training (ref models.py:26-55, scale 1e-3) can address them uniformly.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as fnn

Dtype = Any

BN_MOMENTUM = 0.997
BN_EPSILON = 1e-5
POOL_EPSILON = 1e-5
DEFAULT_L2 = 1e-3

# Variance-scaling initializer matching TF1's default
# (scale=1.0, mode='fan_in', distribution='truncated_normal').
conv_kernel_init = jax.nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal"
)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf-based) GELU (ref models.py:58-59)."""
    return x * 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def mish(x: jax.Array) -> jax.Array:
    """Mish activation (ref tdnn_model.py:89-90)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def layer_norm(x: jax.Array, axes: Sequence[int] = (-1,)) -> jax.Array:
    """Parameterless layer norm, eps 1e-5 (ref models.py:84-104)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=tuple(axes), keepdims=True)
    var = jnp.var(x32, axis=tuple(axes), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + BN_EPSILON)).astype(x.dtype)


def _pad_amounts(kernel_size: Union[int, Tuple[int, int]]) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    if isinstance(kernel_size, int):
        kh = kw = kernel_size
    else:
        kh, kw = kernel_size
    ph, pw = kh - 1, kw - 1
    return (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)


def fixed_padding(x: jax.Array, kernel_size: Union[int, Tuple[int, int]]) -> jax.Array:
    """Explicit symmetric padding, NHWC (ref models.py:107-152)."""
    (hb, he), (wb, we) = _pad_amounts(kernel_size)
    return jnp.pad(x, [(0, 0), (hb, he), (wb, we), (0, 0)])


# Trace-time BN-statistics grouping (per-replica BN).  1 = global-batch
# statistics (sync-BN under pjit); G > 1 = statistics over each of G equal
# batch groups.  With the batch sharded over a G-way ``data`` mesh axis the
# groups coincide with the shards, so XLA computes the moments without any
# cross-chip reduction -- exactly the reference's per-replica Horovod BN
# (ref models.py:62-73, sync-BN commented out).  Threaded as a contextvar so
# the model zoo's ~12 BN call sites need no extra plumbing; it is read at
# trace time (inside jit tracing), so it must be set around the traced call
# (SpeakerNet.__call__ does this from its ``bn_groups`` field).
_BN_GROUPS: contextvars.ContextVar[int] = contextvars.ContextVar(
    "bn_groups", default=1
)


@contextlib.contextmanager
def bn_groups(groups: int):
    token = _BN_GROUPS.set(max(1, int(groups)))
    try:
        yield
    finally:
        _BN_GROUPS.reset(token)


class _GroupedBN(fnn.Module):
    """Batch norm with statistics per batch group (per-replica BN semantics).

    Variable names/shapes are identical to ``fnn.BatchNorm`` (batch_stats
    ``mean``/``var`` of shape (C,)), so checkpoints are interchangeable with
    the sync-BN path.  Running stats are updated with the across-group mean
    of the group moments (the reference keeps per-replica moving stats and
    checkpoints rank 0's copy; with iid shards these converge to the same
    values, and a single canonical copy keeps the checkpoint layout sane).

    The running *variance* update uses the Bessel-corrected (unbiased)
    variance, matching TF's fused batch norm exactly (verified against
    tf.layers.batch_normalization in tests/test_trainer_oracle.py);
    normalization itself uses the biased variance, also like TF.
    """

    groups: int
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPSILON
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        b, g = x.shape[0], self.groups
        if self.is_initializing():
            g = 1  # init uses a dummy batch-1 example; values are irrelevant
        assert b % g == 0, f"batch {b} not divisible into {g} BN groups"
        xg = x.reshape((g, b // g) + x.shape[1:])
        x32 = xg.astype(jnp.float32)
        axes = tuple(range(1, x32.ndim - 1))
        mean = jnp.mean(x32, axis=axes)                       # (g, C)
        var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)

        if not self.is_initializing():
            # TF parity (tests/test_trainer_oracle.py): the fused batch norm
            # the reference uses on 4-D activations updates moving variance
            # with the Bessel-corrected (unbiased) variance, but on 2-D head
            # inputs (flatten->BN->dense->BN, ref tdnn_model.py:143-151)
            # Keras silently falls back to the non-fused path, which updates
            # with the biased variance.  Mirror both.
            n = x32.size // (g * c)  # elements reduced per channel per group
            bessel = n / (n - 1) if (n > 1 and x.ndim >= 4) else 1.0
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * jnp.mean(mean, axis=0))
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * bessel
                            * jnp.mean(var, axis=0))

        bshape = (g,) + (1,) * len(axes) + (c,)
        y = (x32 - mean.reshape(bshape)) * jax.lax.rsqrt(
            var.reshape(bshape) + self.epsilon)
        return y.reshape(x.shape).astype(self.dtype or x.dtype)


class BatchNorm(fnn.Module):
    """Affine-free batch norm: momentum 0.997, eps 1e-5 (ref models.py:62-67).

    Running statistics live in the ``batch_stats`` collection.  Under pjit
    the batch statistics are computed over the *global* (sharded) batch --
    i.e. sync-BN across the data axis -- replacing the reference's
    per-replica BN (SURVEY.md section 2.4); wrap the traced call in
    ``bn_groups(G)`` to restore per-replica statistics over G batch groups.
    Set ``axis_name`` only when running under shard_map/pmap where XLA cannot
    see the full batch.
    """

    use_running_average: bool = False
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPSILON
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x: jax.Array, use_running_average: Optional[bool] = None) -> jax.Array:
        ura = self.use_running_average if use_running_average is None else use_running_average
        groups = _BN_GROUPS.get()
        if not ura and self.axis_name is None:
            # Training: _GroupedBN (groups=1 == sync-BN) so the running-var
            # update carries TF's Bessel correction (see _GroupedBN doc).
            return _GroupedBN(
                groups=groups, momentum=self.momentum, epsilon=self.epsilon,
                dtype=self.dtype, name="bn",
            )(x)
        return fnn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=False,
            use_scale=False,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="bn",
        )(x)


def _nhwc_dn(x_shape, k_shape):
    return jax.lax.conv_dimension_numbers(x_shape, k_shape,
                                          ("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def grouped_conv(x, kernel, strides, padding, dilation, groups):
    """NHWC grouped conv (``feature_group_count=groups``) with a GSPMD-safe
    backward.

    XLA's SPMD partitioner mis-reduces the KERNEL gradient of a
    feature-grouped conv when the (replicated) kernel lives on a mesh with
    an axis the op does not use: the grad comes back multiplied by that
    axis' size (measured on the 8-device CPU mesh, jax 0.8 era, both GSPMD
    and Shardy; the input gradient and the forward are exact -- see
    tests/test_sharding_parity.py::test_model4_att_pool_matches_model1,
    which caught it).  Keep the fused grouped conv for the forward and the
    input grad, and compute the kernel grad per group with
    feature_group_count=1, which partitions correctly.
    """
    return jax.lax.conv_general_dilated(
        x, kernel, strides, padding, rhs_dilation=dilation,
        dimension_numbers=_nhwc_dn(x.shape, kernel.shape),
        feature_group_count=groups)


def _grouped_conv_fwd(x, kernel, strides, padding, dilation, groups):
    return grouped_conv(x, kernel, strides, padding, dilation, groups), (x, kernel)


def _grouped_conv_bwd(strides, padding, dilation, groups, res, ybar):
    x, kernel = res

    def fwd_x(a):
        return jax.lax.conv_general_dilated(
            a, kernel, strides, padding, rhs_dilation=dilation,
            dimension_numbers=_nhwc_dn(a.shape, kernel.shape),
            feature_group_count=groups)

    _, vjp_x = jax.vjp(fwd_x, x)
    dx, = vjp_x(ybar)

    # dk per group with feature_group_count=1, vmapped over the group axis
    # (one fused dispatch; measured exact under the mesh, and the Python-
    # loop version cost dpn68 (cardinality 32) 16% step time).
    b, h, w, _ = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    oh, ow = ybar.shape[1], ybar.shape[2]
    ci = x.shape[-1] // groups
    co = kernel.shape[-1] // groups
    xg = jnp.moveaxis(x.reshape(b, h, w, groups, ci), 3, 0)
    yg = jnp.moveaxis(ybar.reshape(b, oh, ow, groups, co), 3, 0)
    kg = jnp.moveaxis(kernel.reshape(kh, kw, ci, groups, co), 3, 0)

    def one_group_dk(xg, kg, yg):
        def fwd_k(kk):
            return jax.lax.conv_general_dilated(
                xg, kk, strides, padding, rhs_dilation=dilation,
                dimension_numbers=_nhwc_dn(xg.shape, kk.shape))
        return jax.vjp(fwd_k, kg)[1](yg)[0]

    dk = jax.vmap(one_group_dk)(xg, kg, yg)         # (G, kh, kw, ci, co)
    dk = jnp.moveaxis(dk, 0, 3).reshape(kh, kw, ci, groups * co)
    return dx, dk


grouped_conv.defvjp(_grouped_conv_fwd, _grouped_conv_bwd)


class _GroupedConvKernel(fnn.Module):
    """Kernel holder + grouped_conv call; named "conv" inside Conv2d so the
    param path (<conv2d>/conv/kernel) matches fnn.Conv's for checkpoints."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Any
    dilation: Tuple[int, int]
    groups: int
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", conv_kernel_init,
            (*self.kernel_size, ci, self.features), jnp.float32)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        else:
            # mirror fnn.Conv's dtype promotion: conv_general_dilated
            # requires matching operand dtypes (e.g. f64 or bf16 inputs
            # against the fp32 kernel param)
            common = jnp.promote_types(x.dtype, kernel.dtype)
            x = x.astype(common)
            kernel = kernel.astype(common)
        return grouped_conv(x, kernel, self.strides, self.padding,
                            self.dilation, self.groups)


class Conv2d(fnn.Module):
    """Bias-free NHWC conv with grouped-conv support (ref models.py:173-203).

    ``cardinality`` maps to XLA ``feature_group_count``; the kernel has shape
    [kh, kw, in_channels // cardinality, out_channels], identical to the
    reference's TF layout, so checkpoints port one-to-one.  cardinality > 1
    routes through :func:`grouped_conv` for its GSPMD-safe kernel gradient.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    dilation: Union[int, Tuple[int, int]] = 1
    cardinality: int = 1
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.strides,) * 2 if isinstance(self.strides, int) else tuple(self.strides)
        dl = (self.dilation,) * 2 if isinstance(self.dilation, int) else tuple(self.dilation)
        if self.cardinality > 1:
            pad = (self.padding if isinstance(self.padding, str)
                   else tuple(map(tuple, self.padding)))
            return _GroupedConvKernel(
                features=self.features, kernel_size=ks, strides=st,
                padding=pad, dilation=dl, groups=self.cardinality,
                dtype=self.dtype, name="conv",
            )(x)
        return fnn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=self.padding,
            kernel_dilation=dl,
            feature_group_count=self.cardinality,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvFixedPadding(fnn.Module):
    """Strided conv with explicit fixed padding (ref models.py:155-168).

    stride==1 -> SAME padding; stride>1 -> fixed_padding then VALID.  For odd
    kernels at stride 1 these coincide; at stride>1 the output-position
    anchoring differs from SAME, matching the reference exactly.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    cardinality: int = 1
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        st = (self.strides,) * 2 if isinstance(self.strides, int) else tuple(self.strides)
        strided = any(s > 1 for s in st)
        if strided:
            x = fixed_padding(x, self.kernel_size)
        return Conv2d(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=st,
            padding="VALID" if strided else "SAME",
            cardinality=self.cardinality,
            dtype=self.dtype,
            name="conv2d",
        )(x)


class Dense(fnn.Module):
    """Bias-free dense with variance-scaling init (ref models.py:306-309)."""

    features: int
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return fnn.Dense(
            features=self.features,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="dense",
        )(x)


class SqueezeExcitation(fnn.Module):
    """Squeeze-and-excitation over (H, W) (ref models.py:313-326).

    ``mask``: optional (B, T) validity mask -- the squeeze mean then runs
    over valid frames only (x must already be zero at masked positions), so
    padded batched inference matches the exact-length forward."""

    ratio: int = 16
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        channels = x.shape[-1]
        assert channels % self.ratio == 0
        x32 = x.astype(jnp.float32)
        if mask is None:
            scale = jnp.mean(x32, axis=(1, 2), keepdims=True).astype(x.dtype)
        else:
            m = mask[:, : x.shape[1]].astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(m, axis=1), 1.0) * x.shape[2]
            scale = (jnp.sum(x32, axis=(1, 2), keepdims=True)
                     / denom[:, None, None, None]).astype(x.dtype)
        scale = Conv2d(channels // self.ratio, 1, dtype=self.dtype, name="squeeze")(scale)
        scale = jax.nn.relu(scale)
        scale = Conv2d(channels, 1, dtype=self.dtype, name="excite")(scale)
        scale = jax.nn.sigmoid(scale)
        return scale * x


def _masked_moments(
    x: jax.Array, mask: Optional[jax.Array], axis: int
) -> Tuple[jax.Array, jax.Array]:
    """Mean/variance over ``axis``, optionally restricted to mask==1 frames.

    x: (..., T, ..., C) fp32; mask: broadcastable 0/1 over the time axis.
    """
    if mask is None:
        mean = jnp.mean(x, axis=axis, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
        return mean, var
    denom = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=True), 1.0)
    mean = jnp.sum(x * mask, axis=axis, keepdims=True) / denom
    var = jnp.sum(jnp.square(x - mean) * mask, axis=axis, keepdims=True) / denom
    return mean, var


def _time_mask_for(x: jax.Array, mask: Optional[jax.Array]) -> Optional[jax.Array]:
    """Broadcast a (B, T) validity mask to x's NHWC rank (time = axis 1)."""
    if mask is None:
        return None
    return mask.astype(jnp.float32)[:, :, None, None]


def mask_time(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Zero out invalid time positions of an NHWC tensor.

    Applied after every block when a validity mask is present, this makes a
    zero-padded batched forward *bit-identical* to the exact-length forward:
    the zeros a conv would have seen from SAME/fixed padding at the true
    utterance boundary are exactly what the mask re-imposes, so no padding
    garbage can bleed through multi-layer receptive fields.
    """
    if mask is None:
        return x
    m = mask[:, : x.shape[1]].astype(x.dtype)
    return x * m[:, :, None, None]


def downsample_mask(mask: Optional[jax.Array], strides: int, t_out: int) -> Optional[jax.Array]:
    """Track a (B, T) validity mask through a stride-`s` conv: output position
    j is anchored at input position s*j, so keep every s-th flag."""
    if mask is None or strides == 1:
        return None if mask is None else mask[:, :t_out]
    return mask[:, ::strides][:, :t_out]


def stats_pool(x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """Statistics pooling over time (NHWC axis 1): mean || sqrt(var + eps).

    Output shape (B, 1, W, 2C) as in ref models.py:262-269.  ``mask`` is an
    optional (B, T) 0/1 validity mask for padded batched extraction.
    """
    x32 = x.astype(jnp.float32)
    m = _time_mask_for(x, mask)
    mean, var = _masked_moments(x32, m, axis=1)
    out = jnp.concatenate([mean, jnp.sqrt(var + POOL_EPSILON)], axis=3)
    return out.astype(x.dtype)


class AttStatsPool(fnn.Module):
    """Attentive statistics pooling (ref models.py:273-303).

    attention = softmax_over_time(conv1x1_C(tanh(conv1x1_128([x; mu; sigma]))))
    output    = weighted_mean || weighted_std, shape (B, 1, W, 2C).
    """

    att_dim: int = 128
    att_with_mean_std: bool = True
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        channels = x.shape[-1]
        t = x.shape[1]
        x32 = x.astype(jnp.float32)
        m = _time_mask_for(x, mask)

        if self.att_with_mean_std:
            mean, var = _masked_moments(x32, m, axis=1)
            mean_std = jnp.concatenate([mean, jnp.sqrt(var + POOL_EPSILON)], axis=3)
            mean_std = jnp.broadcast_to(
                mean_std, (x.shape[0], t, x.shape[2], 2 * channels)
            )
            att_in = jnp.concatenate([x, mean_std.astype(x.dtype)], axis=3)
        else:
            att_in = x

        scores = Conv2d(self.att_dim, 1, dtype=self.dtype, name="att_conv1")(att_in)
        scores = jnp.tanh(scores)
        scores = Conv2d(channels, 1, dtype=self.dtype, name="att_conv2")(scores)
        scores = scores.astype(jnp.float32)
        if m is not None:
            scores = jnp.where(m > 0, scores, -1e30)
        weights = jax.nn.softmax(scores, axis=1)

        wmean = jnp.sum(x32 * weights, axis=1, keepdims=True)
        wsq = jnp.sum(x32 * x32 * weights, axis=1, keepdims=True)
        wstd = jnp.sqrt(jnp.maximum(wsq - wmean * wmean, 0.0) + POOL_EPSILON)
        return jnp.concatenate([wmean, wstd], axis=3).astype(x.dtype)


class EmbeddingHead(fnn.Module):
    """Pool -> flatten -> BN -> dense(output_dim) -> BN (ref tdnn_model.py:142-153,
    res2net_model.py:229-242, dpn_model.py:151-167).

    The flatten keeps the (downsampled) frequency axis, so the dense input dim
    is freq_out * 2*channels -- a deliberate reference quirk we preserve.
    """

    output_dim: int
    pool: str = "stats"  # "stats" | "att_stats"
    dtype: Optional[Dtype] = None

    @fnn.compact
    def __call__(
        self, x: jax.Array, training: bool, mask: Optional[jax.Array] = None
    ) -> jax.Array:
        if self.pool == "stats":
            x = stats_pool(x, mask)
        elif self.pool == "att_stats":
            x = AttStatsPool(dtype=self.dtype, name="att_stats_pool")(x, mask)
        else:
            raise ValueError(f"unknown pool {self.pool}")
        x = x.reshape((x.shape[0], -1))
        x = BatchNorm(use_running_average=not training, dtype=self.dtype, name="pre_bn")(x)
        x = Dense(self.output_dim, dtype=self.dtype, name="embedding")(x)
        x = BatchNorm(use_running_average=not training, dtype=self.dtype, name="post_bn")(x)
        return x


def avg_pool_3x3(x: jax.Array, strides: int) -> jax.Array:
    """3x3 VALID average pool; pads are materialized zeros included in the
    mean, matching ref res2net_model.py:77 after fixed_padding.

    Implemented as 9 strided-slice adds (not lax.reduce_window, whose
    reverse-mode AD is unsupported under some pjit configurations); XLA fuses
    this into a single VPU loop.
    """
    _, h, w, _ = x.shape
    oh = (h - 3) // strides + 1
    ow = (w - 3) // strides + 1
    total = None
    for di in range(3):
        for dj in range(3):
            piece = x[:, di: di + (oh - 1) * strides + 1: strides,
                      dj: dj + (ow - 1) * strides + 1: strides, :]
            total = piece if total is None else total + piece
    return total / jnp.asarray(9.0, x.dtype)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "gelu": gelu,
    "mish": mish,
}
