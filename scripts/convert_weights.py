"""Convert torchvision pretrained weights → the framework's .npz format.

This environment (and many TPU pods) has zero network egress, so
ImageNet-pretrained weights for FID/IS (InceptionV3) and the perceptual
loss (VGG16) must be provisioned offline:

1. On any machine with internet:
       inception_v3_google-*.pth  (torchvision inception_v3 IMAGENET1K_V1)
       vgg16-*.pth                (torchvision vgg16 IMAGENET1K_V1)
2. Copy the .pth here and convert (torch needed only for this step):
       python scripts/convert_weights.py inception <pth> inception_v3.npz
       python scripts/convert_weights.py vgg16 <pth> vgg16.npz
3. Point the framework at them:
       export DMU_INCEPTION_WEIGHTS=/path/inception_v3.npz
       export DMU_VGG16_WEIGHTS=/path/vgg16.npz

FID/IS then run literature-comparable and fully jitted on TPU
(`utils/inception.py`); PerceptualLoss uses real VGG16 features
(`utils/vgg.py`). Reference equivalents:
`/root/reference/utils/benchmarks.py:27-75`,
`/root/reference/utils/losses.py:183-216`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 4 or sys.argv[1] not in ("inception", "vgg16",
                                                 "ddpm", "export_ddpm"):
        print(__doc__)
        print("\nAlso: python scripts/convert_weights.py ddpm "
              "<reference .pt checkpoint> <out .ckpt>\n"
              "  Imports a TRAINED reference DDPM/DDIM checkpoint (either "
              "schema: model-only\n  {model_state_dict, config} or the "
              "full trainer checkpoint) into this\n  framework's "
              "model-only format; load with\n"
              "    DDPM.load_with_config(out) or generate.py "
              "--checkpoint <out .ckpt>\n"
              "  (the emitted config sets conv_bias: true — the reference "
              "parameterization).\n\n"
              "And the inverse: python scripts/convert_weights.py "
              "export_ddpm <our .ckpt> <out .pt>\n"
              "  Exports a model trained HERE back to the reference's "
              "{model_state_dict, config}\n  torch schema (strict-loadable "
              "by the reference DDPM class; missing conv biases\n"
              "  export as zeros — functionally identical under the "
              "following GroupNorms).")
        sys.exit(1)
    kind, src, dst = sys.argv[1:4]

    if kind == "export_ddpm":
        import pickle

        import torch

        from diffusion_model_universal_tpu.models.convert import (
            export_ddpm_checkpoint)
        with open(src, "rb") as f:
            payload = pickle.load(f)
        out = export_ddpm_checkpoint(payload)
        out["model_state_dict"] = {
            k: torch.from_numpy(v.copy())
            for k, v in out["model_state_dict"].items()}
        torch.save(out, dst)
        print(f"exported {len(out['model_state_dict'])} tensors")
        print(f"wrote {dst}")
        return

    import torch
    state_dict = torch.load(src, map_location="cpu", weights_only=True)
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()

    if kind == "inception":
        from diffusion_model_universal_tpu.utils.inception import (
            convert_torch_state_dict, save_inception_npz)
        save_inception_npz(convert_torch_state_dict(state_dict), dst)
    elif kind == "ddpm":
        import pickle

        from diffusion_model_universal_tpu.models.convert import (
            convert_ddpm_checkpoint)
        payload = convert_ddpm_checkpoint(state_dict)
        with open(dst, "wb") as f:
            pickle.dump(payload, f)
        n = sum(v.size for v in _leaves(payload["model_state_dict"]))
        print(f"converted {n:,} parameters"
              + (" (+EMA)" if "ema_model_state_dict" in payload else ""))
    else:
        from diffusion_model_universal_tpu.utils.vgg import (
            convert_torch_vgg16, save_vgg16_npz)
        save_vgg16_npz(convert_torch_vgg16(state_dict), dst)
    print(f"wrote {dst}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
