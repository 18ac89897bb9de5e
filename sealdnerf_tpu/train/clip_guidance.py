"""CLIP guidance loss for GT-free training (reference nerf/clip_utils.py:
11-64: ViT-B/16 similarity between rendered low-res frames at random orbit
poses and a text prompt, used with --clip_text and --rand_pose).

Uses the HuggingFace transformers CLIP implementation (the `clip` package of
the reference is absent). Pretrained weights require network access or a
local cache; when unavailable the loss degrades to disabled with a warning
(`available = False`), matching how LPIPS is gated.
"""

import numpy as np


class CLIPLoss:
    def __init__(self, text: str, model_name: str = "openai/clip-vit-base-patch16"):
        self.available = False
        self.text = text
        try:
            import torch
            from transformers import CLIPModel, CLIPProcessor
            self._torch = torch
            self.model = CLIPModel.from_pretrained(model_name)
            self.model.eval()
            self.processor = CLIPProcessor.from_pretrained(model_name)
            with torch.no_grad():
                tok = self.processor(text=[text], return_tensors="pt",
                                     padding=True)
                self.text_features = self.model.get_text_features(**tok)
                self.text_features = self.text_features / \
                    self.text_features.norm(dim=-1, keepdim=True)
            self.available = True
        except Exception as e:  # offline / no weights
            print(f"[WARN] CLIP guidance unavailable: {e}")

    def __call__(self, image: np.ndarray) -> float:
        """image: [H, W, 3] float in [0, 1] -> 1 - cosine similarity.

        Note: runs on host torch (cpu); use small render resolutions. The
        similarity is a scalar diagnostic/loss weight, not a jitted gradient
        path -- GT-free CLIP training uses it REINFORCE-style or with small
        finite-difference updates (the reference backpropagates through the
        render; a full jax CLIP port is on the roadmap).
        """
        if not self.available:
            return 0.0
        torch = self._torch
        with torch.no_grad():
            img = torch.from_numpy(
                np.ascontiguousarray(image, dtype=np.float32))
            img = img.permute(2, 0, 1)[None]
            img = torch.nn.functional.interpolate(
                img, (224, 224), mode="bilinear", align_corners=False)
            mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])
            std = torch.tensor([0.26862954, 0.26130258, 0.27577711])
            img = (img - mean[None, :, None, None]) / \
                std[None, :, None, None]
            feat = self.model.get_image_features(pixel_values=img)
            feat = feat / feat.norm(dim=-1, keepdim=True)
            sim = (feat * self.text_features).sum()
        return float(1.0 - sim)


class FlaxCLIPGuidance:
    """Differentiable (jittable) CLIP guidance for GT-free training.

    Wraps transformers' FlaxCLIPModel so the text-image similarity can be
    backpropagated through the render inside the jitted semantic step
    (Trainer._build_semantic_step) -- the TPU-native equivalent of the
    reference backprop through torch CLIP (nerf/clip_utils.py:11-64).

    Degrades to available = False when pretrained weights cannot be loaded
    offline; the Trainer then skips the semantic branch with a warning
    (same gating pattern as LPIPSMeter).
    """

    def __init__(self, text: str,
                 model_name: str = "openai/clip-vit-base-patch16"):
        self.available = False
        self.text = text
        try:
            from transformers import FlaxCLIPModel, CLIPProcessor
            import jax.numpy as jnp
            model = FlaxCLIPModel.from_pretrained(model_name)
            processor = CLIPProcessor.from_pretrained(model_name)
            tok = processor(text=[text], return_tensors="np", padding=True)
            tf = model.get_text_features(**{k: v for k, v in tok.items()})
            tf = tf / np.linalg.norm(np.asarray(tf), axis=-1, keepdims=True)
            self._text_features = jnp.asarray(np.asarray(tf))
            self._model = model
            self._mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
            self._std = jnp.array([0.26862954, 0.26130258, 0.27577711])
            self.available = True
        except Exception as e:  # offline / no weights
            print(f"[WARN] CLIP guidance unavailable: {e}")

    def loss_fn(self, image):
        """image [H, W, 3] in [0, 1] -> scalar 1 - cos_sim. Jittable and
        differentiable in `image`."""
        import jax
        import jax.numpy as jnp
        img = jax.image.resize(image, (224, 224, 3), method="bilinear")
        img = (img - self._mean) / self._std
        pv = jnp.transpose(img, (2, 0, 1))[None]
        feat = self._model.get_image_features(pixel_values=pv)
        feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
        return 1.0 - jnp.sum(feat * self._text_features)
