"""Top-level scene-layout diffusion model: conditioning assembly + task APIs.

TPU-native re-design of the reference DiffusionSceneLayout_DDPM
(`scene_synthesis/networks/diffusion_scene_layout_ddpm.py:14-454`).

Differences by design:
- The module holds only networks/parameters (denoiser + conditioning heads).
  Diffusion math and sampling loops are pure functions from
  `diffuscene_tpu.diffusion`, orchestrated by `SceneDiffusion` below, so the
  whole train step / sample loop jits as one XLA program.
- Text encoders (BERT/CLIP/GloVe) are frozen in the reference
  (diffusion_scene_layout_ddpm.py:43-52), so we precompute token embeddings
  host-side in the data pipeline (see `data/text.py`) and only keep the small
  trainable projection `fc_text_f` on device.  This removes the frozen BERT
  forward from the hot loop.
- Empty-slot filtering is a vectorized mask computation
  (`delete_empty_from_network_samples`) instead of a per-slot Python loop
  (diffusion_scene_layout_ddpm.py:352-406).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..diffusion import (
    AttributeSpec,
    DiffusionSchedule,
    LossConfig,
    make_schedule,
    p_losses,
    q_sample,
)
from ..diffusion import samplers as S
from .denoiser import Unet1D


@dataclasses.dataclass(frozen=True)
class SceneModelConfig:
    """Static model configuration (mirrors the YAML ``network`` section)."""

    # attribute layout
    point_dim: int = 62
    translation_dim: int = 3
    size_dim: int = 3
    angle_dim: int = 2
    class_dim: int = 22
    objectness_dim: int = 0
    objfeat_dim: int = 32
    # conditioning
    sample_num_points: int = 12
    room_mask_condition: bool = False
    latent_dim: int = 0
    instance_condition: bool = True
    learnable_embedding: bool = True
    instance_emb_dim: int = 128
    text_condition: bool = False
    text_glove_embedding: bool = False
    text_clip_embedding: bool = False
    text_embed_dim: int = 512
    room_partial_condition: bool = False
    partial_num_points: int = 0
    partial_emb_dim: int = 64
    room_arrange_condition: bool = False
    arrange_emb_dim: int = 64
    # diffusion
    schedule_type: str = "linear"
    beta_start: float = 1e-4
    beta_end: float = 0.02
    time_num: int = 1000
    loss_type: str = "mse"
    model_mean_type: str = "v"
    model_var_type: str = "fixedsmall"
    loss_separate: bool = True
    loss_iou: bool = True
    # denoiser net kwargs
    net_kwargs: Tuple[Tuple[str, Any], ...] = ()

    @property
    def bbox_dim(self) -> int:
        return self.translation_dim + self.size_dim + self.angle_dim

    @property
    def spec(self) -> AttributeSpec:
        return AttributeSpec(
            translation_dim=self.translation_dim,
            size_dim=self.size_dim,
            angle_dim=self.angle_dim,
            class_dim=self.class_dim,
            objectness_dim=self.objectness_dim,
            objfeat_dim=self.objfeat_dim,
        )

    @property
    def loss_config(self) -> LossConfig:
        return LossConfig(
            model_mean_type=self.model_mean_type,
            model_var_type=self.model_var_type,
            loss_type=self.loss_type,
            loss_separate=self.loss_separate,
            loss_iou=self.loss_iou,
            room_arrange_condition=self.room_arrange_condition,
        )

    @classmethod
    def from_config(cls, network: Dict[str, Any]) -> "SceneModelConfig":
        """Build from a reference-format ``network`` config dict (YAML)."""
        dk = network.get("diffusion_kwargs", {})
        fields = dict(
            point_dim=network.get("point_dim", 62),
            translation_dim=network.get("translation_dim", 3),
            size_dim=network.get("size_dim", 3),
            angle_dim=network.get("angle_dim", 1),
            class_dim=network.get("class_dim", 21),
            objectness_dim=network.get("objectness_dim", 1),
            objfeat_dim=network.get("objfeat_dim", 0),
            sample_num_points=network.get("sample_num_points", 12),
            room_mask_condition=network.get("room_mask_condition", True),
            latent_dim=network.get("latent_dim", 0),
            instance_condition=network.get("instance_condition", False),
            learnable_embedding=network.get("learnable_embedding", False),
            instance_emb_dim=network.get("instance_emb_dim", 64),
            text_condition=network.get("text_condition", False),
            text_glove_embedding=network.get("text_glove_embedding", False),
            text_clip_embedding=network.get("text_clip_embedding", False),
            text_embed_dim=network.get("text_embed_dim", 512),
            room_partial_condition=network.get("room_partial_condition", False),
            partial_num_points=network.get("partial_num_points", 0),
            partial_emb_dim=network.get("partial_emb_dim", 64),
            room_arrange_condition=network.get("room_arrange_condition", False),
            arrange_emb_dim=network.get("arrange_emb_dim", 64),
            schedule_type=dk.get("schedule_type", "linear"),
            beta_start=dk.get("beta_start", 1e-4),
            beta_end=dk.get("beta_end", 0.02),
            time_num=dk.get("time_num", 1000),
            loss_type=dk.get("loss_type", "mse"),
            model_mean_type=dk.get("model_mean_type", "eps"),
            model_var_type=dk.get("model_var_type", "fixedsmall"),
            loss_separate=dk.get("loss_separate", False),
            loss_iou=dk.get("loss_iou", False),
            net_kwargs=tuple(sorted(network.get("net_kwargs", {}).items())),
        )
        return cls(**fields)


def pack_target(cfg: SceneModelConfig, sample_params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Pack attribute dict into the diffusion target vector.

    Mirrors diffusion_scene_layout_ddpm.py:148-160 ordering:
    [translations, sizes, angles, class_labels (, objectness)(, objfeats)].
    """
    parts = [
        sample_params["translations"],
        sample_params["sizes"],
        sample_params["angles"],
        sample_params["class_labels"],
    ]
    if cfg.objectness_dim > 0:
        parts.append(sample_params["objectness"])
    if cfg.objfeat_dim > 0:
        key = "objfeats_32" if cfg.objfeat_dim == 32 else "objfeats"
        parts.append(sample_params[key])
    return jnp.concatenate(parts, axis=-1)


def build_unet1d(cfg: "SceneModelConfig") -> Unet1D:
    """Unet1D from the config's net_kwargs (shared by the Flax module setup
    and the fused inference engine)."""
    net_kwargs = dict(cfg.net_kwargs)
    known = set(Unet1D.__dataclass_fields__.keys())
    net_kwargs = {k: v for k, v in net_kwargs.items() if k in known}
    net_kwargs.setdefault("text_condition", cfg.text_condition)
    net_kwargs.setdefault("text_dim", cfg.text_embed_dim)
    if "dim_mults" in net_kwargs:
        net_kwargs["dim_mults"] = tuple(net_kwargs["dim_mults"])
    if isinstance(net_kwargs.get("compute_dtype"), str):
        # YAML configs name the dtype ("bfloat16" / "float32")
        net_kwargs["compute_dtype"] = {
            "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
            "float32": jnp.float32, "f32": jnp.float32,
        }[net_kwargs["compute_dtype"]]
    return Unet1D(**net_kwargs)


class ConditionNets(nn.Module):
    """Trainable conditioning heads (diffusion_scene_layout_ddpm.py:27-129)."""

    cfg: SceneModelConfig
    room_feature_size: int = 64

    @nn.compact
    def __call__(
        self,
        batch_size: int,
        num_points: int,
        room_feat: Optional[jnp.ndarray] = None,  # (B, F) from the feature extractor
        text_emb: Optional[jnp.ndarray] = None,  # (B, L, 768|50) precomputed token embs
        partial_input: Optional[jnp.ndarray] = None,  # (B, N, point_dim) zero-masked
        arrange_input: Optional[jnp.ndarray] = None,  # (B, N, size+class+objness+objfeat)
    ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        cfg = self.cfg
        parts = []

        if cfg.room_mask_condition and room_feat is not None:
            if cfg.latent_dim <= 0:
                raise ValueError(
                    "room_mask_condition=True needs network.latent_dim > 0 "
                    "(the fc_room_f width, diffusion_scene_layout_ddpm.py:30); "
                    "the Unet's net_kwargs context_dim must grow by the same "
                    "amount so the condition vector fits")
            room_f = nn.Dense(cfg.latent_dim, name="fc_room_f")(room_feat)
            parts.append(jnp.broadcast_to(room_f[:, None, :], (batch_size, num_points, room_f.shape[-1])))

        if cfg.instance_condition:
            if cfg.learnable_embedding:
                pos = self.param(
                    "positional_embedding",
                    nn.initializers.normal(1.0),
                    (cfg.sample_num_points, cfg.instance_emb_dim),
                    jnp.float32,
                )
                inst = jnp.broadcast_to(pos[None, :num_points, :], (batch_size, num_points, cfg.instance_emb_dim))
            else:
                eye = jnp.eye(cfg.sample_num_points, dtype=jnp.float32)[None]
                eye = jnp.broadcast_to(eye, (batch_size, cfg.sample_num_points, cfg.sample_num_points))
                h = nn.Dense(cfg.instance_emb_dim, use_bias=False, name="fc_instance_0")(eye)
                h = nn.leaky_relu(h, negative_slope=0.1)
                inst = nn.Dense(cfg.instance_emb_dim, use_bias=False, name="fc_instance_1")(h)
            parts.append(inst)

        if cfg.room_partial_condition and partial_input is not None:
            h = nn.Dense(cfg.partial_emb_dim, use_bias=False, name="fc_partial_0")(partial_input)
            h = nn.leaky_relu(h, negative_slope=0.1)
            parts.append(nn.Dense(cfg.partial_emb_dim, use_bias=False, name="fc_partial_1")(h))

        if cfg.room_arrange_condition and arrange_input is not None:
            h = nn.Dense(cfg.arrange_emb_dim, use_bias=False, name="fc_arrange_0")(arrange_input)
            h = nn.leaky_relu(h, negative_slope=0.1)
            parts.append(nn.Dense(cfg.arrange_emb_dim, use_bias=False, name="fc_arrange_1")(h))

        condition = jnp.concatenate(parts, axis=-1) if parts else None

        condition_cross = None
        if cfg.text_condition and text_emb is not None:
            if cfg.text_clip_embedding:
                # CLIP sentence embedding arrives precomputed; used as a single token
                condition_cross = text_emb if text_emb.ndim == 3 else text_emb[:, None, :]
            else:
                # BERT (768) or GloVe (50) token embeddings -> project
                condition_cross = nn.Dense(cfg.text_embed_dim, name="fc_text_f")(text_emb)
        return condition, condition_cross


class SceneNetworks(nn.Module):
    """Denoiser + conditioning heads as one parameterized flax module."""

    cfg: SceneModelConfig
    room_feature_size: int = 64

    feature_extractor_name: str = "resnet18"

    def setup(self):
        # reference passes net_kwargs straight into Unet1D (diffusion_scene_layout_ddpm.py:60)
        self.denoiser = build_unet1d(self.cfg)
        self.conditioner = ConditionNets(self.cfg, self.room_feature_size)
        if self.cfg.room_mask_condition:
            # room-mask encoder (diffusion_scene_layout_ddpm.py:27-33 +
            # feature_extractors.py) — frozen-BN ResNet18/AlexNet
            from .feature_extractors import get_feature_extractor

            self.feature_extractor = get_feature_extractor(
                self.feature_extractor_name, feature_size=self.room_feature_size,
                input_channels=1,
            )

    def extract_room_feat(self, room_layout):
        """(B, 1, H, W) or (B, H, W, 1) room mask -> (B, F) features."""
        return self.feature_extractor(room_layout)

    def denoise(self, x, t, condition, condition_cross):
        return self.denoiser(x, t, condition, condition_cross)

    def make_condition(self, batch_size, num_points, room_feat=None, text_emb=None,
                       partial_input=None, arrange_input=None, room_layout=None):
        if room_feat is None and room_layout is not None and self.cfg.room_mask_condition:
            room_feat = self.extract_room_feat(room_layout)
        return self.conditioner(
            batch_size, num_points, room_feat, text_emb, partial_input, arrange_input
        )

    def __call__(self, x, t, batch_size, num_points, room_feat=None, text_emb=None,
                 partial_input=None, arrange_input=None, room_layout=None):
        """Init-friendly combined path (used for parameter initialization)."""
        condition, condition_cross = self.make_condition(
            batch_size, num_points, room_feat, text_emb, partial_input, arrange_input,
            room_layout=room_layout,
        )
        return self.denoise(x, t, condition, condition_cross)


class SceneDiffusion:
    """Task-level API binding networks + schedule + loss/samplers.

    Equivalent of DiffusionSceneLayout_DDPM + DiffusionPoint
    (diffusion_scene_layout_ddpm.py:131-347, diffusion_ddpm.py:721-804), but
    as pure functions over an explicit params pytree.
    """

    def __init__(self, cfg: SceneModelConfig, bounds: Optional[Dict[str, np.ndarray]] = None,
                 room_feature_size: int = 64):
        self.cfg = cfg
        self.spec = cfg.spec
        self.loss_cfg = cfg.loss_config
        self.net = SceneNetworks(cfg, room_feature_size)
        self.sched: DiffusionSchedule = make_schedule(
            cfg.schedule_type, cfg.beta_start, cfg.beta_end, cfg.time_num,
            model_mean_type=cfg.model_mean_type,
        )
        if bounds is not None:
            self.bounds = {k: jnp.asarray(v, jnp.float32) for k, v in bounds.items()}
        else:
            self.bounds = None

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, batch_size: int = 2) -> Dict:
        cfg = self.cfg
        N = cfg.sample_num_points
        D = cfg.point_dim if not cfg.room_arrange_condition else cfg.translation_dim + cfg.angle_dim
        x = jnp.zeros((batch_size, N, D), jnp.float32)
        t = jnp.zeros((batch_size,), jnp.int32)
        kwargs = {}
        if cfg.room_mask_condition:
            kwargs["room_layout"] = jnp.zeros((batch_size, 64, 64, 1), jnp.float32)
        if cfg.text_condition:
            from ..data.factory import text_emb_dim_for_network  # single source

            tdim = text_emb_dim_for_network(
                {"text_glove_embedding": cfg.text_glove_embedding,
                 "text_clip_embedding": cfg.text_clip_embedding})
            kwargs["text_emb"] = jnp.zeros((batch_size, 16, tdim), jnp.float32)
        if cfg.room_partial_condition:
            kwargs["partial_input"] = jnp.zeros((batch_size, N, cfg.point_dim), jnp.float32)
        if cfg.room_arrange_condition:
            arr_dim = cfg.size_dim + cfg.class_dim + cfg.objectness_dim + cfg.objfeat_dim
            kwargs["arrange_input"] = jnp.zeros((batch_size, N, arr_dim), jnp.float32)
        return self.net.init(key, x, t, batch_size, N, **kwargs)

    # ------------------------------------------------------------------
    def _conditions_from_batch(self, params, sample_params: Dict[str, jnp.ndarray],
                               target: jnp.ndarray):
        """Assemble (condition, condition_cross) for a training batch.

        Mirrors diffusion_scene_layout_ddpm.py:162-221.
        """
        cfg = self.cfg
        B, N = target.shape[0], cfg.sample_num_points
        kwargs = {}
        if cfg.room_mask_condition:
            if "room_feat" in sample_params:
                kwargs["room_feat"] = sample_params["room_feat"]
            else:
                kwargs["room_layout"] = sample_params["room_layout"]
        if cfg.text_condition:
            kwargs["text_emb"] = sample_params["text_emb"]
        if cfg.room_partial_condition:
            P = cfg.partial_num_points
            mask = (jnp.arange(N) < P).astype(target.dtype)[None, :, None]
            kwargs["partial_input"] = target * mask
        if cfg.room_arrange_condition:
            td, sd, bd = cfg.translation_dim, cfg.size_dim, cfg.bbox_dim
            kwargs["arrange_input"] = jnp.concatenate(
                [target[:, :, td : td + sd], target[:, :, bd:]], axis=-1
            )
        return self.net.apply(params, B, N, method=SceneNetworks.make_condition, **kwargs)

    # ------------------------------------------------------------------
    def get_loss(self, params, sample_params: Dict[str, jnp.ndarray], key: jax.Array):
        """Training loss for one batch.  (diffusion_scene_layout_ddpm.py:131-226
        + diffusion_ddpm.py:758-772)."""
        cfg = self.cfg
        # fast path: the native C++ batcher (data/loader.py) delivers the
        # packed (B, N, point_dim) target directly
        if "packed" in sample_params:
            target_full = sample_params["packed"]
        else:
            target_full = pack_target(cfg, sample_params)
        condition, condition_cross = self._conditions_from_batch(params, sample_params, target_full)

        if cfg.room_arrange_condition:
            td, sd, bd = cfg.translation_dim, cfg.size_dim, cfg.bbox_dim
            target = jnp.concatenate(
                [target_full[:, :, :td], target_full[:, :, td + sd : bd]], axis=-1
            )
        else:
            target = target_full

        B = target.shape[0]
        k_t, k_noise = jax.random.split(key)
        t = jax.random.randint(k_t, (B,), 0, self.sched.num_timesteps, dtype=jnp.int32)
        noise = jax.random.normal(k_noise, target.shape, dtype=target.dtype)
        data_t = q_sample(self.sched, target, t, noise)

        denoise_out = self.net.apply(
            params, data_t, t, condition, condition_cross, method=SceneNetworks.denoise
        )
        losses, loss_dict = p_losses(
            self.sched, self.spec, self.loss_cfg, denoise_out,
            target, data_t, t, noise, bounds=self.bounds,
        )
        return losses.mean(), loss_dict

    # ------------------------------------------------------------------
    def _denoise_fn(self, params, condition, condition_cross, fused=False):
        """``fused`` may be False (Flax forward), True (3-D serving engine),
        ``"rows"`` (flat-row engine with whole-level Pallas chains) or
        ``"rows_xla"`` (flat-row engine, chains in plain XLA).  The row
        engines fall back to the 3-D engine for configs the chains don't
        cover (unequal level dims)."""
        if fused:
            # serving path (models/inference.py): once-per-call weight
            # standardization + dtype casts, precomputed time-FiLM tables and
            # conditioning contexts — everything step-invariant leaves the scan
            from .inference import (
                fused_unet1d_forward,
                fused_unet1d_forward_rows,
                precompute_conditioning,
                prepare_chain_params,
                prepare_inference_params,
            )

            unet = build_unet1d(self.cfg)
            inf_params = prepare_inference_params(
                unet, params["params"]["denoiser"],
                num_timesteps=self.sched.num_timesteps,
            )
            cond_ctx = precompute_conditioning(unet, inf_params, condition, condition_cross)

            if fused in ("rows", "rows_xla"):
                try:
                    chains = prepare_chain_params(
                        unet, inf_params, frozenset(cond_ctx["film_c"]))
                except ValueError:
                    chains = None
                if chains is not None:
                    film_c2 = {
                        name: v.reshape(-1, v.shape[-1])
                        for name, v in cond_ctx["film_c"].items()
                    }
                    ctx_rows = {"film_c2": film_c2, "cross": cond_ctx["cross"]}
                    backend = "xla" if fused == "rows_xla" else "pallas"

                    def fn(x, t):
                        return fused_unet1d_forward_rows(
                            unet, inf_params, chains, x, t, ctx_rows,
                            chain_backend=backend,
                        )

                    return fn

            def fn(x, t):
                return fused_unet1d_forward(
                    unet, inf_params, x, t, condition, condition_cross, cond_ctx=cond_ctx
                )

            return fn

        def fn(x, t):
            return self.net.apply(
                params, x, t, condition, condition_cross, method=SceneNetworks.denoise
            )
        return fn

    def sample(
        self,
        params,
        key: jax.Array,
        batch_size: int,
        room_feat=None,
        room_layout=None,
        text_emb=None,
        partial_boxes=None,
        input_boxes=None,
        clip_denoised: bool = False,
        ret_traj: bool = False,
        freq: int = 100,
        ddim: bool = False,
        ddim_steps: int = 50,
        ddim_eta: float = 0.0,
        dpm: bool = False,
        dpm_steps: int = 20,
        fused: bool = False,
    ) -> jnp.ndarray:
        """Unified sampling entry (diffusion_scene_layout_ddpm.py:228-310).

        Completion (``partial_boxes``) and rearrangement (``input_boxes``)
        use dedicated ancestral chains (RePaint splice / arrange splice), so
        they cannot be combined with the ``ddim``/``dpm`` fast samplers.
        """
        if (partial_boxes is not None or input_boxes is not None) and (ddim or dpm):
            raise ValueError(
                "ddim/dpm fast sampling is not supported for completion "
                "(partial_boxes) or rearrangement (input_boxes): those tasks "
                "run dedicated ancestral splice chains")
        cfg = self.cfg
        N, D = cfg.sample_num_points, cfg.point_dim
        kwargs = {}
        if cfg.room_mask_condition:
            kwargs["room_feat"] = room_feat
            if room_feat is None and room_layout is not None:
                kwargs["room_layout"] = room_layout
                kwargs.pop("room_feat")
        if cfg.text_condition:
            kwargs["text_emb"] = text_emb
        if cfg.room_partial_condition and partial_boxes is not None:
            pad = jnp.zeros((batch_size, N - partial_boxes.shape[1], partial_boxes.shape[2]))
            kwargs["partial_input"] = jnp.concatenate([partial_boxes, pad], axis=1)
        if cfg.room_arrange_condition and input_boxes is not None:
            td, sd, bd = cfg.translation_dim, cfg.size_dim, cfg.bbox_dim
            kwargs["arrange_input"] = jnp.concatenate(
                [input_boxes[:, :, td : td + sd], input_boxes[:, :, bd:]], axis=-1
            )
        condition, condition_cross = self.net.apply(
            params, batch_size, N, method=SceneNetworks.make_condition, **kwargs
        )
        fn = self._denoise_fn(params, condition, condition_cross, fused=fused)
        shape = (batch_size, N, D)
        mmt, mvt = cfg.model_mean_type, cfg.model_var_type

        if input_boxes is not None:
            sub = S.p_sample_loop_arrange(
                self.sched, mmt, mvt, fn, shape, key,
                cfg.translation_dim, cfg.angle_dim, clip_denoised,
            )
            # splice predicted (trans, angle) into the conditioning boxes
            td, sd, bd = cfg.translation_dim, cfg.size_dim, cfg.bbox_dim
            return jnp.concatenate(
                [
                    sub[:, :, :td],
                    input_boxes[:, :, td : td + sd],
                    sub[:, :, td:],
                    input_boxes[:, :, bd:],
                ],
                axis=-1,
            )
        if partial_boxes is not None:
            return S.p_sample_loop_complete(
                self.sched, mmt, mvt, fn, shape, key, partial_boxes, clip_denoised
            )
        if dpm:
            return S.dpm_solver_sample_loop(
                self.sched, mmt, fn, shape, key, dpm_steps, clip_denoised
            )
        if ddim:
            return S.ddim_sample_loop(
                self.sched, mmt, fn, shape, key, ddim_steps, ddim_eta, clip_denoised
            )
        if ret_traj:
            return S.p_sample_loop_trajectory(
                self.sched, mmt, mvt, fn, shape, key, freq, clip_denoised
            )
        return S.p_sample_loop(self.sched, mmt, mvt, fn, shape, key, clip_denoised)

    # ------------------------------------------------------------------
    def prior_kl(self, x0: jnp.ndarray) -> jnp.ndarray:
        """KL(q(x_T|x_0) || N(0,I)) in bits/dim.  (diffusion_ddpm.py:735-736)"""
        from ..diffusion.gaussian import prior_bpd

        return prior_bpd(self.sched, x0)

    def all_kl(self, params, x0: jnp.ndarray, key: jax.Array,
               sample_params: Optional[Dict[str, jnp.ndarray]] = None,
               clip_denoised: bool = True) -> Dict[str, jnp.ndarray]:
        """Full variational-bound sweep (DiffusionPoint.all_kl,
        diffusion_ddpm.py:738-746)."""
        from ..diffusion.samplers import calc_bpd_loop

        condition, condition_cross = (None, None)
        if sample_params is not None:
            condition, condition_cross = self._conditions_from_batch(
                params, sample_params, x0)
        else:
            condition, condition_cross = self.net.apply(
                params, x0.shape[0], x0.shape[1], method=SceneNetworks.make_condition)
        fn = self._denoise_fn(params, condition, condition_cross)
        total, terms, prior, mse = calc_bpd_loop(
            self.sched, self.cfg.model_mean_type, self.cfg.model_var_type,
            fn, x0, key, clip_denoised)
        return {"total_bpd_b": total, "terms_bpd": terms,
                "prior_bpd_b": prior, "mse_bt": mse}

    # ------------------------------------------------------------------
    def split_samples(self, samples: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Split packed samples into attribute dict + objectness mask (vectorized).

        Equivalent of the slicing part of delete_empty_from_network_samples
        (diffusion_scene_layout_ddpm.py:352-364); the ragged filtering happens
        host-side in `eval/postprocess.py`.
        """
        spec = self.spec
        out = {
            "translations": samples[:, :, spec.trans_slice],
            "sizes": samples[:, :, spec.size_slice],
            "angles": samples[:, :, spec.angle_slice],
            # raw probability map without the empty channel
            "class_labels": samples[:, :, spec.bbox_dim : spec.bbox_dim + spec.class_dim - 1]
            if spec.objectness_dim == 0
            else samples[:, :, spec.class_slice],
            "objectness": samples[:, :, spec.empty_slice],
        }
        if spec.objfeat_dim > 0:
            out["objfeats"] = samples[:, :, spec.objfeat_slice]
        if spec.objectness_dim > 0:
            out["is_empty"] = samples[:, :, spec.empty_slice][..., 0] < 0
        else:
            out["is_empty"] = samples[:, :, spec.empty_slice][..., 0] >= 0
        return out
