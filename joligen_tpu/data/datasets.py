"""Dataset modes (host-side sample producers).

Each dataset returns per-sample dicts of numpy arrays with keys matching the
reference contract (data/base_dataset.py:120-195): ``A``, ``B`` (H,W,C float32
in [-1,1]), ``A_label_mask``/``B_label_mask`` (H,W,1 int32),
``A_label_cls``/``B_label_cls`` (int32 scalars), plus path metadata.
"""

from __future__ import annotations

import os
import random

import numpy as np

from .image_folder import (
    make_dataset,
    make_labeled_path_dataset,
)
from .transforms import (
    PairedTransform,
    fill_mask_with_color,
    fill_mask_with_random,
    load_image,
    load_mask,
)
from .online_creation import crop_image, sample_rotation_state
from .temporal_sampling import TemporalFrameStepMixin


class BaseDataset:
    def __init__(self, opt, phase, name=""):
        self.opt = opt
        self.phase = phase
        self.name = name
        self.root = opt.dataroot
        suffix = name or ""
        # direction swap (reference base_dataset.py:73-88)
        btoa = getattr(opt, "data_direction", "AtoB") == "BtoA"
        dir_A = "B" if btoa else "A"
        dir_B = "A" if btoa else "B"
        self.dir_A = os.path.join(self.root, phase + dir_A + suffix)
        self.dir_B = os.path.join(self.root, phase + dir_B + suffix)
        self.transform = PairedTransform(
            opt, phase,
            grayscale=(getattr(opt, "model_input_nc", 3) == 1))
        self.use_domain_B = True

    def _load_img(self, p):
        # bound image loader so data_image_bits>8 keeps its depth
        # (reference data/utils.py:4-14, base_dataset.py:92-95)
        return load_image(self._resolve(p),
                          int(getattr(self.opt, "data_image_bits", 8) or 8))

    def _resolve(self, p):
        if getattr(self.opt, "data_relative_paths", False):
            return os.path.join(self.root, p)
        # paths.txt entries are absolute by default (reference contract), but
        # fall back to dataroot-relative instead of failing every sample when
        # the user forgot --data_relative_paths
        if not os.path.isabs(p) and not os.path.exists(p):
            cand = os.path.join(self.root, p)
            if os.path.exists(cand):
                return cand
        return p

    def __len__(self):
        return self.A_size

    def __getitem__(self, index):
        raise NotImplementedError


class UnalignedDataset(BaseDataset):
    """Unpaired A/B (reference data/unaligned_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.A_img_paths = make_dataset(self.dir_A, opt.data_max_dataset_size)
        self.B_img_paths = make_dataset(self.dir_B, opt.data_max_dataset_size)
        self.A_size = len(self.A_img_paths)
        self.B_size = len(self.B_img_paths)

    def __getitem__(self, index):
        A_path = self.A_img_paths[index % self.A_size]
        if getattr(self.opt, "data_serial_batches", False):
            B_path = self.B_img_paths[index % self.B_size]
        else:
            B_path = self.B_img_paths[random.randint(0, self.B_size - 1)]
        pA = self.transform.sample_params()
        pB = self.transform.sample_params()
        return {
            "A": self.transform.image(self._load_img(A_path), pA),
            "B": self.transform.image(self._load_img(B_path), pB),
            "A_img_paths": A_path,
            "B_img_paths": B_path,
        }


class _LabeledPathsMixin:
    """Parses trainX/paths.txt lines: 'img [cls] [mask]'
    (reference data/image_folder.py:81-104 + unaligned_labeled_* variants)."""

    def _load_side(self, d, with_cls, with_mask):
        if os.path.exists(os.path.join(d, "paths.txt")):
            imgs, labels = make_labeled_path_dataset(
                d, "/paths.txt", self.opt.data_max_dataset_size)
        else:
            imgs, labels = make_labeled_path_dataset(
                self.root, "/paths.txt", self.opt.data_max_dataset_size)
        cls_list, mask_list = [], []
        for lab in labels:
            parts = lab.split()
            if with_cls and with_mask:
                cls_list.append(int(parts[0]) if len(parts) > 1 else 0)
                mask_list.append(parts[-1])
            elif with_mask:
                mask_list.append(parts[-1])
                cls_list.append(0)
            elif with_cls:
                cls_list.append(int(parts[0]))
                mask_list.append(None)
        return imgs, cls_list, mask_list


class UnalignedLabeledMaskDataset(BaseDataset, _LabeledPathsMixin):
    with_cls = False
    with_mask = True

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.A_img_paths, self.A_cls, self.A_mask_paths = self._load_side(
            self.dir_A, self.with_cls, self.with_mask)
        self.A_size = len(self.A_img_paths)
        self.B_img_paths, self.B_cls, self.B_mask_paths = [], [], []
        if self.use_domain_B and os.path.isdir(self.dir_B):
            try:
                self.B_img_paths, self.B_cls, self.B_mask_paths = self._load_side(
                    self.dir_B, self.with_cls, self.with_mask)
            except (AssertionError, FileNotFoundError, ValueError):
                self.B_img_paths = make_dataset(
                    self.dir_B, self.opt.data_max_dataset_size)
                self.B_cls = [0] * len(self.B_img_paths)
                self.B_mask_paths = [None] * len(self.B_img_paths)
        self.B_size = len(self.B_img_paths)

    def get_img(self, A_path, A_mask_path, A_cls, B_path=None, B_mask_path=None,
                B_cls=None):
        p = self.transform.sample_params()
        out = {
            "A": self.transform.image(self._load_img(A_path), p),
            "A_img_paths": A_path,
            "A_label_cls": np.int32(A_cls or 0),
        }
        if A_mask_path:
            out["A_label_mask"] = self.transform.mask(
                load_mask(self._resolve(A_mask_path)), p)
        if B_path is not None:
            pB = self.transform.sample_params()
            out["B"] = self.transform.image(self._load_img(B_path), pB)
            out["B_img_paths"] = B_path
            out["B_label_cls"] = np.int32(B_cls or 0)
            if B_mask_path:
                out["B_label_mask"] = self.transform.mask(
                    load_mask(self._resolve(B_mask_path)), pB)
        return out

    def __getitem__(self, index):
        A_path = self.A_img_paths[index % self.A_size]
        A_mask = self.A_mask_paths[index % self.A_size] if self.with_mask else None
        A_cls = self.A_cls[index % self.A_size] if self.A_cls else 0
        B_path = B_mask = B_cls = None
        if self.B_size:
            j = (index % self.B_size
                 if getattr(self.opt, "data_serial_batches", False)
                 else random.randint(0, self.B_size - 1))
            B_path = self.B_img_paths[j]
            B_mask = self.B_mask_paths[j] if self.with_mask else None
            B_cls = self.B_cls[j] if self.B_cls else 0
        return self.get_img(A_path, A_mask, A_cls, B_path, B_mask, B_cls)


class UnalignedLabeledClsDataset(UnalignedLabeledMaskDataset):
    with_cls = True
    with_mask = False


class UnalignedLabeledMaskClsDataset(UnalignedLabeledMaskDataset):
    with_cls = True
    with_mask = True


class SelfSupervisedLabeledMaskDataset(UnalignedLabeledMaskDataset):
    """A = mask-noised copy of the single domain; B = original
    (reference data/self_supervised_labeled_mask_dataset.py:23-60)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.use_domain_B = False

    def __getitem__(self, index):
        A_path = self.A_img_paths[index % self.A_size]
        A_mask = self.A_mask_paths[index % self.A_size]
        A_cls = self.A_cls[index % self.A_size] if self.A_cls else 0
        out = self.get_img(A_path, A_mask, A_cls)
        img, mask = out["A"], out["A_label_mask"]
        if getattr(self.opt, "data_online_creation_rand_mask_A", True):
            noised = fill_mask_with_random(img, mask, -1)
        else:
            # color fill otherwise (reference
            # self_supervised_*_dataset.py:45-53 raises when NEITHER flag is
            # set; defaulting to the color fill keeps default configs
            # trainable instead of failing every sample)
            noised = fill_mask_with_color(img, mask)
        out.update({
            "A": noised,
            "B": img,
            "B_img_paths": out["A_img_paths"],
            "B_label_mask": mask.copy(),
            "B_label_cls": out["A_label_cls"],
        })
        return out


class SelfSupervisedLabeledMaskClsDataset(SelfSupervisedLabeledMaskDataset):
    with_cls = True


class _OnlineMixin:
    """bbox-file-driven online crops (reference
    data/unaligned_labeled_mask_online_dataset.py:81-247)."""

    def _sanitize(self, img_paths, mask_paths):
        """Drop unreadable samples upfront (reference
        data_sanitize_paths, online_creation.py:1405-1488)."""
        if not getattr(self.opt, "data_sanitize_paths", False):
            return img_paths, mask_paths
        from .online_creation import sanitize_paths
        root = self.root if getattr(self.opt, "data_relative_paths",
                                    False) else None
        return sanitize_paths(img_paths, mask_paths, root=root, verbose=True)

    def online_crop(self, img_path, bbox_path, domain="A", rotation_state=None):
        opt = self.opt
        # ratio deltas override pixel deltas when set (reference
        # temporal_labeled_mask_online_dataset.py:141-145)
        ratio = getattr(opt,
                        f"data_online_creation_mask_delta_{domain}_ratio",
                        [[]])
        crop, mask, ref_bbox, cat = crop_image(
            self._resolve(img_path),
            self._resolve(bbox_path),
            mask_delta=getattr(opt, f"data_online_creation_mask_delta_{domain}", [[]]),
            mask_delta_ratio=ratio,
            mask_random_offset=getattr(
                opt, f"data_online_creation_mask_random_offset_{domain}", [0.0]),
            crop_delta=getattr(opt, f"data_online_creation_crop_delta_{domain}", 50),
            mask_square=getattr(opt, f"data_online_creation_mask_square_{domain}", False),
            crop_dim=getattr(opt, f"data_online_creation_crop_size_{domain}", 512),
            output_dim=opt.data_crop_size,
            context_pixels=getattr(opt, "data_online_context_pixels", 0),
            load_size=getattr(opt, f"data_online_creation_load_size_{domain}", []),
            load_size_keep_ratio=getattr(
                opt, f"data_online_creation_load_size_keep_ratio_{domain}", False),
            select_cat=getattr(opt, "data_online_select_category", -1),
            fixed_mask_size=getattr(opt, "data_online_fixed_mask_size", -1),
            fixed_mask_size_model=getattr(
                opt, f"data_online_creation_mask_fixed_size_{domain}", -1),
            fixed_mask_min_unmasked_border_model=getattr(
                opt, f"data_online_creation_mask_min_unmasked_border_{domain}", 4),
            inverted_mask=getattr(opt, "data_inverted_mask", False),
            single_bbox=getattr(opt, "data_online_single_bbox", False),
            random_bbox=getattr(opt, "data_online_random_bbox", False),
            broaden_rect_aug=getattr(
                opt, f"data_online_creation_mask_broaden_rect_aug_{domain}", False),
            rotation_state=rotation_state,
        )
        if getattr(opt, "data_refined_mask", False):
            # SAM-refined object mask (reference data_refined_mask,
            # base_diffusion_model.py:265-271); no-op without sam_vit.npz
            from ..utils.mask_generation import refine_mask_with_sam
            mask = refine_mask_with_sam(crop, mask)
        if getattr(opt, "f_s_all_classes_as_one", False):
            # reference unaligned_labeled_mask_online_dataset.py:146
            mask = (mask > 0).astype(np.int32)
        return crop, mask, ref_bbox, cat


class UnalignedLabeledMaskOnlineDataset(UnalignedLabeledMaskDataset, _OnlineMixin):
    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.A_img_paths, self.A_mask_paths = self._sanitize(
            self.A_img_paths, self.A_mask_paths)
        self.A_size = len(self.A_img_paths)
        if self.B_size:
            self.B_img_paths, self.B_mask_paths = self._sanitize(
                self.B_img_paths, self.B_mask_paths)
            self.B_size = len(self.B_img_paths)

    def get_img(self, A_path, A_mask_path, A_cls, B_path=None, B_mask_path=None,
                B_cls=None):
        try:
            A, A_mask, A_ref_bbox, A_cat = self.online_crop(
                A_path, A_mask_path, "A",
                rotation_state=sample_rotation_state(self.opt))
        except Exception as e:  # unreadable sample -> skip (collate filters None)
            print(f"online crop failure {A_path}: {e}")
            return None
        out = {"A": A, "A_label_mask": A_mask, "A_ref_bbox": A_ref_bbox,
               "A_img_paths": A_path,
               "A_label_cls": np.int32(A_cat if self.with_cls else (A_cls or 0))}
        if B_path is not None and B_mask_path:
            try:
                B, B_mask, B_ref_bbox, B_cat = self.online_crop(
                    B_path, B_mask_path, "B",
                    rotation_state=sample_rotation_state(self.opt))
            except Exception as e:
                print(f"online crop failure {B_path}: {e}")
                return None
            out.update({"B": B, "B_label_mask": B_mask, "B_ref_bbox": B_ref_bbox,
                        "B_img_paths": B_path,
                        "B_label_cls": np.int32(B_cat if self.with_cls else (B_cls or 0))})
        return out


class UnalignedLabeledMaskClsOnlineDataset(UnalignedLabeledMaskOnlineDataset):
    with_cls = True


class SelfSupervisedLabeledMaskOnlineDataset(UnalignedLabeledMaskOnlineDataset):
    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.use_domain_B = False

    def __getitem__(self, index):
        A_path = self.A_img_paths[index % self.A_size]
        A_mask = self.A_mask_paths[index % self.A_size]
        A_cls = self.A_cls[index % self.A_size] if self.A_cls else 0
        out = self.get_img(A_path, A_mask, A_cls)
        if out is None:
            return None
        img, mask = out["A"], out["A_label_mask"]
        if getattr(self.opt, "data_online_creation_rand_mask_A", True):
            noised = fill_mask_with_random(img, mask, -1)
        else:
            # color fill otherwise (reference
            # self_supervised_*_dataset.py:45-53 raises when NEITHER flag is
            # set; defaulting to the color fill keeps default configs
            # trainable instead of failing every sample)
            noised = fill_mask_with_color(img, mask)
        out.update({"A": noised, "B": img, "B_img_paths": out["A_img_paths"],
                    "B_label_mask": mask.copy(), "B_label_cls": out["A_label_cls"],
                    "B_ref_bbox": out.get("A_ref_bbox")})
        return out


class SelfSupervisedLabeledMaskClsOnlineDataset(SelfSupervisedLabeledMaskOnlineDataset):
    with_cls = True


class UnalignedLabeledMaskRefDataset(UnalignedLabeledMaskDataset):
    """Mask dataset + per-image reference/conditioning image resolved from
    trainA/conditions.txt (reference data/unaligned_labeled_mask_ref_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        from .image_folder import make_ref_path
        self.A_img_ref = make_ref_path(self.dir_A, "/conditions.txt")
        self.ref_size = int(getattr(opt, "alg_diffusion_ref_size", -1) or -1)
        if self.ref_size <= 0:
            self.ref_size = opt.data_crop_size

    def _load_ref(self, img_path):
        ref_path = self.A_img_ref[img_path]
        from PIL import Image
        ref = self._load_img(ref_path)
        ref = ref_resize(ref, self.ref_size)
        return ref

    def __getitem__(self, index):
        out = super().__getitem__(index)
        if out is None:
            return None
        try:
            out["ref_A"] = self._load_ref(out["A_img_paths"])
        except Exception as e:
            print(f"failure reading A domain image ref for "
                  f"{out['A_img_paths']}: {e}")
            return None
        return out


class UnalignedLabeledMaskOnlineRefDataset(UnalignedLabeledMaskOnlineDataset):
    """Online-crop dataset + reference image
    (reference data/unaligned_labeled_mask_online_ref_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        from .image_folder import make_ref_path
        self.A_img_ref = make_ref_path(self.dir_A, "/conditions.txt")
        self.ref_size = int(getattr(opt, "alg_diffusion_ref_size", -1) or -1)
        if self.ref_size <= 0:
            self.ref_size = opt.data_crop_size

    def __getitem__(self, index):
        out = super().__getitem__(index)
        if out is None:
            return None
        try:
            ref_path = self.A_img_ref[out["A_img_paths"]]
            out["ref_A"] = ref_resize(self._load_img(ref_path),
                                      self.ref_size)
        except Exception as e:
            print(f"ref load failure {out['A_img_paths']}: {e}")
            return None
        return out


class SelfSupervisedLabeledMaskRefDataset(SelfSupervisedLabeledMaskDataset):
    """Self-supervised mask dataset + reference image (reference
    data/self_supervised_labeled_mask_ref_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        from .image_folder import make_ref_path
        self.A_img_ref = make_ref_path(self.dir_A, "/conditions.txt")
        self.ref_size = int(getattr(opt, "alg_diffusion_ref_size", -1) or -1)
        if self.ref_size <= 0:
            self.ref_size = opt.data_crop_size

    def __getitem__(self, index):
        out = super().__getitem__(index)
        if out is None:
            return None
        try:
            ref_path = self.A_img_ref[out["A_img_paths"]]
            out["ref_A"] = ref_resize(self._load_img(ref_path),
                                      self.ref_size)
        except Exception as e:
            print(f"ref load failure {out['A_img_paths']}: {e}")
            return None
        return out


class SelfSupervisedLabeledMaskOnlineRefDataset(
        SelfSupervisedLabeledMaskOnlineDataset):
    """Self-supervised online dataset + reference image."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        from .image_folder import make_ref_path
        self.A_img_ref = make_ref_path(self.dir_A, "/conditions.txt")
        self.ref_size = int(getattr(opt, "alg_diffusion_ref_size", -1) or -1)
        if self.ref_size <= 0:
            self.ref_size = opt.data_crop_size

    def __getitem__(self, index):
        out = super().__getitem__(index)
        if out is None:
            return None
        try:
            ref_path = self.A_img_ref[out["A_img_paths"]]
            out["ref_A"] = ref_resize(self._load_img(ref_path),
                                      self.ref_size)
        except Exception as e:
            print(f"ref load failure {out['A_img_paths']}: {e}")
            return None
        return out


class UnalignedLabeledMaskOnlinePromptDataset(UnalignedLabeledMaskOnlineDataset):
    """Online dataset + per-image text prompt from trainB/prompts.txt
    (reference data/unaligned_labeled_mask_online_prompt_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        from .image_folder import make_ref_path_list
        self.B_img_prompt = make_ref_path_list(self.dir_B, "/prompts.txt")

    def __getitem__(self, index):
        out = super().__getitem__(index)
        if out is None or "B_img_paths" not in out:
            return out
        prompts = self.B_img_prompt.get(out["B_img_paths"], [""])
        out["real_B_prompt"] = prompts[0]
        return out


class ColorizationDataset(BaseDataset):
    """RGB -> (L, ab) Lab pairs for pix2pix colorization (reference
    data/colorization_dataset.py; cv2 Lab instead of skimage). A = L channel
    scaled to [-1,1], B = ab channels scaled to [-1,1]."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        d = os.path.join(self.root, phase)
        if not os.path.isdir(d):
            d = self.dir_A
        self.A_img_paths = make_dataset(d, opt.data_max_dataset_size)
        self.A_size = len(self.A_img_paths)

    def __getitem__(self, index):
        import cv2
        p = self.transform.sample_params()
        rgb = self.transform.image(
            self._load_img(self.A_img_paths[index % self.A_size]), p)
        u8 = ((rgb + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        lab = cv2.cvtColor(u8, cv2.COLOR_RGB2LAB).astype(np.float32)
        L = lab[:, :, :1] / 127.5 - 1.0             # L in [0,255] for cv2 8U
        ab = lab[:, :, 1:] / 127.5 - 1.0
        return {"A": L.astype(np.float32), "B": ab.astype(np.float32),
                "A_img_paths": self.A_img_paths[index % self.A_size]}


class NupletUnalignedLabeledMaskDataset(UnalignedLabeledMaskDataset):
    """N consecutive frames from domain A + one B image, for the ReCUT /
    ReCycleGAN next-frame regularization (reference
    data/nuplet_unaligned_labeled_mask_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.nuplet = int(getattr(opt, "alg_re_nuplet_size", 3) or 3)

    def __getitem__(self, index):
        frames, masks = [], []
        # ONE transform draw shared by the whole A nuplet — the frames must
        # stay temporally registered for the P predictor (reference applies
        # a single list transform, nuplet_unaligned_labeled_mask_dataset.py)
        p = self.transform.sample_params()
        for i in range(self.nuplet):
            j = (index + i) % self.A_size
            frames.append(self.transform.image(
                self._load_img(self.A_img_paths[j]), p))
            if self.A_mask_paths[j]:
                masks.append(self.transform.mask(
                    load_mask(self._resolve(self.A_mask_paths[j])), p))
        out = {"A": np.stack(frames), "A_img_paths": self.A_img_paths[index % self.A_size]}
        if masks:
            out["A_label_mask"] = np.stack(masks)
        if self.B_size:
            # B is a nuplet of consecutive frames too (reference
            # nuplet_unaligned_labeled_mask_dataset.py:119-121): the P
            # predictor trains on real-B sequences
            j0 = random.randint(0, max(0, self.B_size - self.nuplet))
            b_frames, b_masks = [], []
            pB = self.transform.sample_params()
            for i in range(self.nuplet):
                j = (j0 + i) % self.B_size
                b_frames.append(self.transform.image(
                    self._load_img(self.B_img_paths[j]), pB))
                if self.B_mask_paths and self.B_mask_paths[j]:
                    b_masks.append(self.transform.mask(
                        load_mask(self._resolve(self.B_mask_paths[j])), pB))
            out["B"] = np.stack(b_frames)
            if b_masks:
                out["B_label_mask"] = np.stack(b_masks)
        return out


class MultiDataset:
    """Weighted mixture of child datasets, each with its own option
    overrides, from a JSON config (reference data/multi_dataset_dataset.py:
    52-305). Two accepted schemas:

    - reference list schema: {"datasets": [{"name", "dataset_mode",
      "dataroot", "weight", "overrides": {flat options}}], "test_sets":
      [{"id", "dataset", "test_name"}]} (test phase picks the test_sets
      entry whose id == the dataset name argument);
    - flat dict schema: {"datasets": {name: {"dataroot", "weight",
      <flat option overrides>}}}.
    """

    def __init__(self, opt, phase, name=""):
        import copy as _copy
        import json as _json
        cfg_path = getattr(opt, "data_multi_dataset_config", "") or ""
        if not cfg_path:
            raise ValueError("multi_dataset mode requires "
                             "--data_multi_dataset_config")
        with open(cfg_path) as f:
            cfg = _json.load(f)
        entries = cfg["datasets"]
        if isinstance(entries, dict):  # flat dict schema
            entries = [{"name": cname,
                        "dataset_mode": c.get("data_dataset_mode",
                                              opt.data_dataset_mode),
                        "overrides": {k: v for k, v in c.items()
                                      if k not in ("weight",
                                                   "data_dataset_mode")},
                        "weight": c.get("weight", 1.0)}
                       for cname, c in entries.items()]
        child_test_names = {}
        if phase == "test" and cfg.get("test_sets"):
            ts = next((t for t in cfg["test_sets"] if t.get("id") == name),
                      None)
            if ts is None:
                raise ValueError(
                    f"test set id '{name}' not in config test_sets: "
                    f"{[t.get('id') for t in cfg['test_sets']]}")
            # accept both key spellings: ours {dataset, test_name} and the
            # generator tool's {dataset_name, child_test_name, dataroot}
            ds = ts.get("dataset", ts.get("dataset_name"))
            tn = ts.get("test_name", ts.get("child_test_name", ""))
            entries = [dict(e) for e in entries if e.get("name") == ds]
            if ts.get("dataroot"):  # generated holdout lives elsewhere
                for e in entries:
                    e["dataroot"] = ts["dataroot"]
            child_test_names = {ds: tn}
        from . import find_dataset_class
        delta_scale = float(getattr(
            opt, "data_multi_dataset_crop_delta_scale", 1.0) or 1.0)
        self.children, self.weights = [], []
        for i, c in enumerate(entries):
            cname = c.get("name", f"dataset_{i}")
            child_opt = _copy.deepcopy(opt)
            overrides = dict(c.get("overrides", {}))
            if "dataroot" in c:
                overrides["dataroot"] = c["dataroot"]
            if "data_online_creation_crop_delta_A" in overrides:
                overrides["data_online_creation_crop_delta_A"] = int(
                    overrides["data_online_creation_crop_delta_A"]
                    * delta_scale)
            for k, v in overrides.items():
                setattr(child_opt, k, v)
            mode = c.get("dataset_mode", opt.data_dataset_mode)
            if mode == "multi_dataset":
                raise ValueError("multi_dataset cannot nest")
            child_opt.data_dataset_mode = mode
            cls = find_dataset_class(mode)
            child_name = child_test_names.get(cname, name) \
                if phase == "test" else name
            self.children.append(cls(child_opt, phase, name=child_name))
            self.weights.append(float(c.get("weight", 1.0)))
        total = sum(self.weights)
        if total <= 0:
            raise ValueError("at least one multi_dataset child weight "
                             "must be > 0")
        self.weights = [w / total for w in self.weights]

    def __len__(self):
        return sum(len(c) for c in self.children)

    def __getitem__(self, index):
        r = random.random()
        acc = 0.0
        for child, w in zip(self.children, self.weights):
            acc += w
            if r <= acc:
                return child[random.randint(0, len(child) - 1)]
        return self.children[-1][index % len(self.children[-1])]


def ref_resize(img, size):
    """PIL image -> (size,size,C) float32 in [-1,1] (reference
    get_transform_ref: resize + normalize, no augmentation)."""
    from PIL import Image
    r = np.asarray(img.resize((size, size), Image.BICUBIC), np.uint8)
    if r.ndim == 2:
        r = r[:, :, None]
    return r.astype(np.float32) / 127.5 - 1.0


class AlignedDataset(BaseDataset):
    """Paired A/B by sorted order (reference data/aligned_dataset.py)."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.A_img_paths = make_dataset(self.dir_A, opt.data_max_dataset_size)
        self.B_img_paths = make_dataset(self.dir_B, opt.data_max_dataset_size)
        self.A_size = len(self.A_img_paths)
        self.B_size = len(self.B_img_paths)

    def __getitem__(self, index):
        p = self.transform.sample_params()
        A_path = self.A_img_paths[index % self.A_size]
        B_path = self.B_img_paths[index % self.B_size]
        return {
            "A": self.transform.image(self._load_img(A_path), p),
            "B": self.transform.image(self._load_img(B_path), p),
            "A_img_paths": A_path, "B_img_paths": B_path,
        }


class SingleDataset(BaseDataset):
    """Single-domain (reference data/single_dataset.py); B = A."""

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.A_img_paths = make_dataset(self.dir_A, opt.data_max_dataset_size)
        self.A_size = len(self.A_img_paths)

    def __getitem__(self, index):
        p = self.transform.sample_params()
        img = self.transform.image(
            self._load_img(self.A_img_paths[index % self.A_size]), p)
        return {"A": img, "B": img,
                "A_img_paths": self.A_img_paths[index % self.A_size]}


def _natural_key(text):
    import re
    return [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", text)]


class TemporalLabeledMaskOnlineDataset(BaseDataset, _OnlineMixin,
                                       TemporalFrameStepMixin):
    """Unpaired video frames with online bbox crops: a sample is
    ``data_temporal_number_frames`` consecutive frames cropped with the SAME
    window (coordinates fixed from frame 0) so the clip is spatially
    consistent (reference data/temporal_labeled_mask_online_dataset.py).

    Emits ``A``/``B`` of shape (F,H,W,C) and masks (F,H,W,1).
    """

    crop_center = False

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.A_img_paths, self.A_mask_paths = make_labeled_path_dataset(
            self.dir_A, "/paths.txt")
        self.A_img_paths.sort(key=_natural_key)
        self.A_mask_paths.sort(key=_natural_key)
        if self.use_domain_B and os.path.isdir(self.dir_B):
            self.B_img_paths, self.B_mask_paths = make_labeled_path_dataset(
                self.dir_B, "/paths.txt")
            self.B_img_paths.sort(key=_natural_key)
            self.B_mask_paths.sort(key=_natural_key)
        else:
            self.B_img_paths, self.B_mask_paths = [], []
        mx = opt.data_max_dataset_size
        if mx and mx > 0:
            self.A_img_paths = self.A_img_paths[:mx]
            self.A_mask_paths = self.A_mask_paths[:mx]
            self.B_img_paths = self.B_img_paths[:mx]
            self.B_mask_paths = self.B_mask_paths[:mx]
        self.A_size = len(self.A_img_paths)
        self.B_size = len(self.B_img_paths)
        self._init_temporal_frame_step_sampling(opt)
        self.num_common_char = int(
            getattr(opt, "data_temporal_num_common_char", -1) or -1)

    def __len__(self):
        return max(self.A_size, self.B_size) if self.B_size else self.A_size

    def _common_char_ok(self, paths, indices):
        if self.num_common_char == -1:
            return True
        ref = os.path.basename(paths[indices[0]])[: self.num_common_char]
        return all(os.path.basename(paths[i])[: self.num_common_char] == ref
                   for i in indices)

    def _pick_window_cached(self, img_paths, step):
        cache = getattr(self, "_window_cache", None)
        if cache is None:
            cache = self._window_cache = {}
        key = (id(img_paths), step)
        if key not in cache:
            from .temporal_sampling import build_temporal_series_index
            cache[key] = build_temporal_series_index(
                img_paths, self.num_frames, step)
        from .temporal_sampling import select_temporal_window
        sel = select_temporal_window(cache[key])
        if sel is None:
            return None
        series_idx, start = sel
        return [series_idx[start + i * step] for i in range(self.num_frames)]

    def _load_clip(self, img_paths, mask_paths, domain):
        """Pick a window, crop every frame with frame-0's window. Returns
        (frames (F,H,W,C), masks (F,H,W,1), ref_bbox, cat) or None."""
        step = self._sample_temporal_frame_step()
        indices = self._pick_window_cached(img_paths, step)
        if indices is None or not self._common_char_ok(img_paths, indices):
            return None
        frames, masks = [], []
        crop_coords = None
        ref_bbox, cat = None, 0
        # centered mode jitters the crop SIZE once per clip instead of the
        # offset (reference self_supervised_vid_mask_online_dataset.py:129-137)
        crop_dim = None
        if self.crop_center:
            base = getattr(self.opt,
                           f"data_online_creation_crop_size_{domain}", 512)
            delta = getattr(self.opt,
                            f"data_online_creation_crop_delta_{domain}", 0)
            crop_dim = random.randint(base - delta, base + delta) \
                if delta > 0 else base
        gc_mode = getattr(self.opt, "alg_b2b_global_context_mode", "none") \
            or "none"
        gc_size = int(getattr(self.opt, "alg_b2b_global_context_size", 128)
                      or 128)
        contexts = []
        # one rotation draw shared by every frame of the clip (reference
        # temporal_labeled_mask_online_dataset.py:112,176,205)
        rotation_state = sample_rotation_state(self.opt)
        for i, gi in enumerate(indices):
            try:
                if i == 0:
                    crop_coords = self._online_crop_kwargs(
                        img_paths[gi], mask_paths[gi], domain,
                        crop_dim_override=crop_dim,
                        get_crop_coordinates=True,
                        rotation_state=rotation_state)
                out = self._online_crop_kwargs(
                    img_paths[gi], mask_paths[gi], domain,
                    crop_dim_override=crop_dim,
                    crop_coordinates=crop_coords,
                    rotation_state=rotation_state)
                if gc_mode != "none":
                    contexts.append(self._global_context_image(
                        img_paths[gi], crop_coords, crop_dim, domain,
                        gc_size))
            except Exception as e:
                print(f"temporal crop failure frame {i} {img_paths[gi]}: {e}")
                return None
            img, mask, bbox, c = out
            if i == 0:
                ref_bbox, cat = bbox, c
            frames.append(img)
            masks.append(self._post_mask(mask))
        gc = np.stack(contexts) if contexts else None
        return (np.stack(frames), np.stack(masks), ref_bbox, cat, step, gc)

    def _global_context_image(self, img_path, crop_coords, crop_dim, domain,
                              gc_size):
        """Full image with the crop window blacked out, resized to the
        global-context size (reference build_masked_global_context_image,
        data/base_dataset.py:1199)."""
        from PIL import Image
        from .transforms import load_image
        img = self._load_img(img_path)
        arr = np.asarray(img, np.uint8).copy()
        cx0, cy0 = crop_coords[0], crop_coords[1]
        cd = crop_coords[2] if len(crop_coords) >= 3 else crop_dim or getattr(
            self.opt, f"data_online_creation_crop_size_{domain}", 512)
        cd = min(cd, arr.shape[0], arr.shape[1])
        arr[cy0:cy0 + cd, cx0:cx0 + cd] = 0
        small = np.asarray(Image.fromarray(arr).resize(
            (gc_size, gc_size), Image.BICUBIC), np.uint8)
        return small.astype(np.float32) / 127.5 - 1.0

    def _online_crop_kwargs(self, img_path, bbox_path, domain,
                            crop_dim_override=None, **extra):
        opt = self.opt
        return crop_image(
            self._resolve(img_path),
            self._resolve(bbox_path),
            mask_delta=getattr(opt, f"data_online_creation_mask_delta_{domain}",
                               [[]]),
            mask_random_offset=getattr(
                opt, f"data_online_creation_mask_random_offset_{domain}", [0.0]),
            crop_delta=(0 if self.crop_center else getattr(
                opt, f"data_online_creation_crop_delta_{domain}", 50)),
            mask_square=getattr(
                opt, f"data_online_creation_mask_square_{domain}", False),
            crop_dim=(crop_dim_override if crop_dim_override is not None
                      else getattr(
                          opt, f"data_online_creation_crop_size_{domain}", 512)),
            output_dim=opt.data_crop_size,
            context_pixels=getattr(opt, "data_online_context_pixels", 0),
            load_size=getattr(
                opt, f"data_online_creation_load_size_{domain}", []),
            load_size_keep_ratio=getattr(
                opt, f"data_online_creation_load_size_keep_ratio_{domain}", False),
            fixed_mask_size=getattr(opt, "data_online_fixed_mask_size", -1),
            fixed_mask_size_model=getattr(
                opt, f"data_online_creation_mask_fixed_size_{domain}", -1),
            fixed_mask_min_unmasked_border_model=getattr(
                opt, f"data_online_creation_mask_min_unmasked_border_{domain}", 4),
            inverted_mask=getattr(opt, "data_inverted_mask", False),
            broaden_rect_aug=getattr(
                opt, f"data_online_creation_mask_broaden_rect_aug_{domain}", False),
            crop_center=self.crop_center,
            **extra,
        )

    def _post_mask(self, mask):
        if getattr(self.opt, "f_s_all_classes_as_one", False):
            return (np.asarray(mask) > 0).astype(np.int32)
        return mask

    def __getitem__(self, index):
        a = self._load_clip(self.A_img_paths, self.A_mask_paths, "A")
        if a is None:
            return None
        A, A_masks, A_ref_bbox, A_cat, step, A_gc = a
        out = {
            "A": A, "A_label_mask": A_masks,
            "A_ref": A[0], "A_ref_label_mask": A_masks[0],
            "A_ref_bbox": A_ref_bbox, "A_label_cls": np.int32(A_cat),
            "A_img_paths": self.A_img_paths[0],
            "temporal_frame_step": np.int32(step),
        }
        if A_gc is not None:
            out["A_global_context"] = A_gc
        if self.B_size:
            b = self._load_clip(self.B_img_paths, self.B_mask_paths, "B")
            if b is None:
                return None
            B, B_masks, B_ref_bbox, B_cat, _, B_gc = b
            out.update({"B": B, "B_label_mask": B_masks,
                        "B_ref": B[0], "B_ref_label_mask": B_masks[0],
                        "B_ref_bbox": B_ref_bbox,
                        "B_label_cls": np.int32(B_cat),
                        "B_img_paths": self.B_img_paths[0]})
            if B_gc is not None:
                out["B_global_context"] = B_gc
        return out


class SelfSupervisedVidMaskOnlineDataset(TemporalLabeledMaskOnlineDataset):
    """Single-domain video: B = original clip, A = clip with the masked
    region randomized (diffusion video inpainting; reference
    data/self_supervised_vid_mask_online_dataset.py). Crops are centered
    (crop_delta jitters the crop SIZE, not the offset)."""

    crop_center = True
    with_cls = False

    def __init__(self, opt, phase, name=""):
        super().__init__(opt, phase, name)
        self.use_domain_B = False
        self.B_img_paths, self.B_mask_paths, self.B_size = [], [], 0

    def __getitem__(self, index):
        a = self._load_clip(self.A_img_paths, self.A_mask_paths, "A")
        if a is None:
            return None
        frames, masks, ref_bbox, cat, step, gc = a
        if getattr(self.opt, "data_online_creation_rand_mask_A", True):
            noised = np.stack([fill_mask_with_random(f, m, -1)
                               for f, m in zip(frames, masks)])
        else:
            noised = np.stack([fill_mask_with_color(f, m)
                               for f, m in zip(frames, masks)])
        cls = np.int32(cat if self.with_cls else 0)
        out = {
            "A": noised, "A_label_mask": masks,
            "A_ref": noised[0], "A_ref_label_mask": masks[0],
            "A_ref_bbox": ref_bbox, "A_label_cls": cls,
            "A_img_paths": self.A_img_paths[0],
            "B": frames, "B_label_mask": masks.copy(),
            "B_ref": frames[0], "B_ref_label_mask": masks[0],
            "B_ref_bbox": ref_bbox, "B_label_cls": cls,
            "B_img_paths": self.A_img_paths[0],
            "temporal_frame_step": np.int32(step),
        }
        if gc is not None:
            out["A_global_context"] = gc
            out["B_global_context"] = gc
        return out


class SelfSupervisedVidLabeledMaskClsOnlineDataset(
        SelfSupervisedVidMaskOnlineDataset):
    with_cls = True


class SelfSupervisedTemporalDataset(TemporalLabeledMaskOnlineDataset):
    """Two-frame next-frame prediction pairs: A = [frame0, masked(frame1)],
    B = [frame0, frame1] (reference data/self_supervised_temporal_dataset.py)."""

    def __getitem__(self, index):
        out = super().__getitem__(index)
        if out is None:
            return None
        frames, masks = out["A"], out["A_label_mask"]
        if frames.shape[0] < 2:
            return None
        if getattr(self.opt, "data_online_creation_rand_mask_A", True):
            masked1 = fill_mask_with_random(frames[1], masks[1], -1)
        else:
            masked1 = fill_mask_with_color(frames[1], masks[1])
        out["B"] = frames
        out["B_label_mask"] = masks.copy()
        out["A"] = np.stack([frames[0], masked1])
        return out
