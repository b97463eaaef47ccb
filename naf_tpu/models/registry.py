"""Model registry (reference utils/wrapper.py:8-52 ModelWrapper).

`build_model(name, embed_dim, ratio)` returns a flax module following the
upsampler forward contract `(image, features, output_size)`; `ModelWrapper`
additionally owns params (random init or converted checkpoint) and is
callable like the reference wrapper.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

__all__ = ["build_model", "ModelWrapper", "register", "MODEL_REGISTRY"]


def _builders() -> Dict[str, Callable]:
    from naf_tpu.models.anyup import AnyUpsampler
    from naf_tpu.models.featup import FeatUp, JBU
    from naf_tpu.models.jafar import JAFAR
    from naf_tpu.models.jbf import JBF
    from naf_tpu.models.naf import NAF
    from naf_tpu.models.restorers import IRCNN, REDNet
    from naf_tpu.models.restormer import Restormer
    from naf_tpu.models.simple import Bilinear, Nearest

    return {
        "AnyUp": lambda embed_dim, ratio: AnyUpsampler(),
        "Bilinear": lambda embed_dim, ratio: Bilinear(),
        "FeatUp": lambda embed_dim, ratio: FeatUp(feature_dim=embed_dim, ratio=ratio),
        "IRCNN": lambda embed_dim, ratio: IRCNN(),
        "JAFAR": lambda embed_dim, ratio: JAFAR(v_dim=embed_dim),
        "JBF": lambda embed_dim, ratio: JBF(),
        "JBU": lambda embed_dim, ratio: JBU(),
        "NAF": lambda embed_dim, ratio: NAF(),
        "Nearest": lambda embed_dim, ratio: Nearest(),
        "REDNet": lambda embed_dim, ratio: REDNet(),
        "Restormer": lambda embed_dim, ratio: Restormer(),
    }


MODEL_REGISTRY: Dict[str, Callable] = {}


def register(name: str, builder: Callable):
    MODEL_REGISTRY[name] = builder


def build_model(name: str, embed_dim: int = 384, ratio: int = 16):
    builders = {**_builders(), **MODEL_REGISTRY}
    if name not in builders:
        raise ValueError(f"Unknown upsampler: {name} (have {sorted(builders)})")
    return builders[name](embed_dim, ratio)


class ModelWrapper:
    """Stateful model + params holder (reference ModelWrapper semantics)."""

    def __init__(
        self,
        name: str,
        embed_dim: int = 384,
        ratio: int = 16,
        ckpt_params=None,
        ckpt_path: str | None = None,
        seed: int = 0,
        init_shapes=None,
    ):
        self.name = name
        self.embed_dim = embed_dim
        self.ratio = ratio
        self.model = build_model(name, embed_dim, ratio)

        if ckpt_path is not None and ckpt_params is None:
            ckpt_params = self._convert_checkpoint(ckpt_path)
        if ckpt_params is not None:
            self.params = jax.tree.map(jnp.asarray, ckpt_params)
        else:
            if init_shapes is None:
                lr = 16
                hr = lr * ratio
                init_shapes = ((1, hr, hr, 3), (1, lr, lr, embed_dim), (hr, hr))
            img = jnp.zeros(init_shapes[0], jnp.float32)
            feats = jnp.zeros(init_shapes[1], jnp.float32)
            variables = self.model.init(
                jax.random.PRNGKey(seed), img, feats, init_shapes[2]
            )
            self.params = variables.get("params", {})

    def _convert_checkpoint(self, ckpt_path: str):
        """Per-family torch-checkpoint conversion (reference ModelWrapper
        loads FeatUp ckpts with the model.1.->norm. remap and other models
        with load_state_dict(strict=False), utils/wrapper.py:18-28)."""
        import torch

        state = torch.load(ckpt_path, map_location="cpu", weights_only=True)
        if self.name == "FeatUp":
            from naf_tpu.models.featup import featup_params_from_torch

            return featup_params_from_torch(state)
        if self.name == "NAF":
            from naf_tpu.convert import naf_params_from_torch

            return naf_params_from_torch(state)
        if self.name == "AnyUp":
            from naf_tpu.models.anyup import convert_checkpoint

            return convert_checkpoint(state)
        raise NotImplementedError(
            f"no torch-checkpoint converter registered for {self.name}"
        )

    def __call__(self, image, features, output_size):
        return self.model.apply(
            {"params": self.params}, image, features, output_size
        )
