"""ResNet feature extractors (ref ResOrDenseNetFeatures,
module/vae_layers/conv.py:247-272).

The reference wraps torchvision's *pretrained* resnet/densenet trunks.
ResNetFeatures is structurally torchvision-faithful (stem + BasicBlock
layers + avg pool), so pretrained weights arriving inside reference jobs'
state.pth transplant exactly through the importer
(save_load/import_reference.py::_map_resnet_features) — no network egress
needed.  DenseNetFeatures is torchvision-faithful for the four named tv
archs (densenet121/161/169/201: 7x7/2 stem, pre-relu norm5 output at
(C, ~h/32, ~w/32), weight-importable via _map_densenet_features) and
keeps the compact from-scratch layout for densenet-small/-tiny (3x3
stem, global-avg-pooled to (C_out, 1, 1)); weights can also be
transferred from another job via
``save_load.transfer.transfer_pretrained``.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

RESNET_LAYERS = {
    'resnet18': (2, 2, 2, 2),
    'resnet34': (3, 4, 6, 3),
    'resnet50': (3, 4, 6, 3),
    'resnet101': (3, 4, 23, 3),
    'resnet152': (3, 8, 36, 3),
}

# torchvision block expansion: BasicBlock nets output width*8 channels,
# Bottleneck nets width*8*4 (the reference's DEFAULT trunk is resnet152,
# ref module/vae_layers/conv.py:249)
RESNET_EXPANSION = {
    'resnet18': 1, 'resnet34': 1,
    'resnet50': 4, 'resnet101': 4, 'resnet152': 4,
}

DENSENET_LAYERS = {
    'densenet121': (6, 12, 24, 16),
    'densenet161': (6, 12, 36, 24),
    'densenet169': (6, 12, 32, 32),
    'densenet201': (6, 12, 48, 32),
    'densenet-small': (2, 4, 4, 2),
    'densenet-tiny': (1, 2),
}

# torchvision-faithful archs: (growth_rate, init_features).  These build
# the torchvision module graph (7x7/2 stem + norm0 + maxpool, denseblocks,
# transitions, final norm5; output is the PRE-relu norm5 map at
# (C, h/32, w/32) — the reference keeps children()[:-1], which cuts
# before DenseNet.forward's relu/avgpool, ref conv.py:256-272) so
# pretrained trunk weights in reference jobs' state.pth transplant
# exactly.  densenet-small/-tiny keep the compact from-scratch layout
# (3x3 stem, global avg pool).
DENSENET_TV = {
    'densenet121': (32, 64),
    'densenet161': (48, 96),
    'densenet169': (32, 64),
    'densenet201': (32, 64),
}


class _BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut — the torchvision
    BasicBlock layout exactly (conv1/bn1/relu/conv2/bn2, downsample =
    1x1 conv + BN when shape changes), so reference-trained torchvision
    trunk weights map onto Conv_0/BatchNorm_0/Conv_1/BatchNorm_1/
    Conv_2/BatchNorm_2 one-to-one (save_load/import_reference.py)."""
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if res.shape != y.shape:
            res = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                          use_bias=False, dtype=self.dtype)(res)
            res = nn.BatchNorm(use_running_average=not train,
                               dtype=self.dtype)(res)
        return nn.relu(y + res)


class _Bottleneck(nn.Module):
    """1x1 reduce / 3x3 / 1x1 expand(4x) + shortcut — torchvision's
    Bottleneck exactly (stride on the 3x3 conv, the post-v0.4 "ResNet B"
    placement; downsample = 1x1 conv + BN), so resnet50/101/152 trunk
    weights map onto Conv_0..2/BatchNorm_0..2 (+ Conv_3/BatchNorm_3 for
    the downsample) one-to-one (save_load/import_reference.py)."""
    features: int                     # bottleneck width; output is 4x this
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(4 * self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        if res.shape != y.shape:
            res = nn.Conv(4 * self.features, (1, 1),
                          (self.stride, self.stride), use_bias=False,
                          dtype=self.dtype)(res)
            res = nn.BatchNorm(use_running_average=not train,
                               dtype=self.dtype)(res)
        return nn.relu(y + res)


class _DenseLayer(nn.Module):
    growth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.growth, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetFeatures(nn.Module):
    """DenseNet-BC trunk (ref densenet feature option,
    module/vae_layers/conv.py:247-272).

    densenet121/161/169/201 are torchvision-faithful (see DENSENET_TV) and
    output the pre-relu norm5 map at (C, h/32, w/32) exactly like the
    reference's ResOrDenseNetFeatures; densenet-small/-tiny keep the
    compact from-scratch layout (3x3 stem, global-avg-pooled to
    (C_out, 1, 1)).  growth/init_features of 0 mean the arch default."""
    arch: str = 'densenet121'
    growth: int = 0
    init_features: int = 0
    input_hw: Tuple[int, int] = (32, 32)
    dtype: jnp.dtype = jnp.float32

    def _resolved(self) -> Tuple[int, int]:
        g0, f0 = DENSENET_TV.get(self.arch, (32, 64))
        return (self.growth or g0, self.init_features or f0)

    @staticmethod
    def _tv_spatial(size: int, transitions: int) -> int:
        """Exact torchvision spatial arithmetic (matches this module's own
        forward): conv0 k7/s2/p3, pool0 k3/s2/p1, then one 2x2/2 floor
        avg-pool per transition.  `size // 32` only when 32 | size."""
        size = (size + 1) // 2          # conv0: (size + 2*3 - 7)//2 + 1
        size = (size + 1) // 2          # pool0: (size + 2*1 - 3)//2 + 1
        for _ in range(transitions):
            size //= 2
        return size

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        blocks = DENSENET_LAYERS[self.arch]
        growth, f = self._resolved()
        for bi, n in enumerate(blocks):
            f += n * growth
            if bi != len(blocks) - 1:
                f = f // 2
        if self.arch in DENSENET_TV:
            h, w = (self._tv_spatial(s, len(blocks) - 1)
                    for s in self.input_hw)
            if h < 1 or w < 1:
                raise ValueError(
                    'input {}x{} is too small for the /32 torchvision '
                    'trunk {} (needs >=29px); use densenet-small/-tiny '
                    'for small inputs'.format(*self.input_hw, self.arch))
            return (f, h, w)
        return (f, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        blocks = DENSENET_LAYERS[self.arch]
        growth, init_features = self._resolved()
        tv = self.arch in DENSENET_TV
        lead = x.shape[:-3]
        c, h, w = x.shape[-3:]
        x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1).astype(self.dtype)
        if tv:
            # torchvision stem: conv0 7x7/2 pad 3, norm0, relu,
            # pool0 3x3/2 pad 1
            x = nn.Conv(init_features, (7, 7), (2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        else:
            x = nn.Conv(init_features, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype)(x)
        for bi, n in enumerate(blocks):
            for _ in range(n):
                x = _DenseLayer(growth, self.dtype)(x, train)
            if bi != len(blocks) - 1:   # transition: halve channels + pool
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype)(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype)(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if tv:
            # norm5, NO relu: the reference trunk is children()[:-1] of
            # torchvision DenseNet — it cuts before forward's relu/pool
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = x.transpose(0, 3, 1, 2)            # back to NCHW
            return x.reshape(lead + x.shape[1:])
        x = jnp.mean(x, axis=(1, 2))
        return x.reshape(lead + (x.shape[-1], 1, 1))


class ResNetFeatures(nn.Module):
    """(..., 3, H, W) -> (..., width*8, 1, 1) feature maps.

    Structurally identical to torchvision's resnet trunk as the
    reference wraps it (ResOrDenseNetFeatures keeps children()[:-1], i.e.
    conv7x7/2 + bn + relu + maxpool3x3/2, layer1..4 of BasicBlocks
    (18/34) or Bottlenecks (50/101/152 — the reference default is
    resnet152), global avg pool; ref module/vae_layers/conv.py:247-272)
    — so ImageNet-
    pretrained weights sitting in reference jobs' state.pth transplant
    exactly (save_load/import_reference.py::_map_resnet_features)."""
    arch: str = 'resnet18'
    width: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def output_shape(self) -> Tuple[int, int, int]:
        return (self.width * 8 * RESNET_EXPANSION[self.arch], 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        blocks = RESNET_LAYERS[self.arch]
        lead = x.shape[:-3]
        c, h, w = x.shape[-3:]
        x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1)  # NHWC
        x = x.astype(self.dtype)
        # torchvision stem: conv 7x7/2 pad 3, bn, relu, maxpool 3x3/2 pad 1
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        block = (_Bottleneck if RESNET_EXPANSION[self.arch] == 4
                 else _BasicBlock)
        f = self.width
        for i, n in enumerate(blocks):
            for j in range(n):
                stride = 2 if (j == 0 and i > 0) else 1
                x = block(f, stride, self.dtype)(x, train)
            f *= 2
        x = jnp.mean(x, axis=(1, 2))                         # global avg pool
        return x.reshape(lead + (x.shape[-1], 1, 1))
