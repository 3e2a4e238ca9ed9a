"""Model layer: training algorithms built on pytree train states and
jitted step functions (TPU-native replacement for the reference's
BaseModel OO engine, models/base_model.py:57-2344)."""


def create_model(opt, phase="train"):
    """Name -> model class registry (reference models/__init__.py:43-93).
    After construction, every NetState is committed to its mesh sharding
    (BaseModel.finalize_states) — required for multi-process runs, where
    jit inputs must be global arrays spanning the full mesh."""
    model = _construct(opt, phase)
    if hasattr(model, "finalize_states"):
        model.finalize_states()
    return model


def _construct(opt, phase):
    name = opt.model_type
    if name in ("palette",):
        from .palette_model import PaletteModel
        return PaletteModel(opt, phase=phase)
    if name in ("cut",):
        from .cut_model import CUTModel
        return CUTModel(opt, phase=phase)
    if name in ("re_cut", "re_cut_semantic_mask"):
        # ReCUT next-frame regularization (dead upstream — its module
        # imports a deleted file and the reference registry hides it —
        # revived here over the nuplet dataset)
        from .cut_model import CUTModel
        if name.endswith("semantic_mask"):
            opt.train_semantic_mask = True
        return CUTModel(opt, phase=phase)
    if name in ("cycle_gan",):
        from .cycle_gan_model import CycleGANModel
        return CycleGANModel(opt, phase=phase)
    if name in ("re_cycle_gan",):
        from .cycle_gan_model import CycleGANModel
        return CycleGANModel(opt, phase=phase)
    if name in ("re_cycle_gan_semantic_mask",):
        # our CycleGAN has no semantic heads yet; silently dropping the
        # supervision would be worse than refusing
        raise NotImplementedError(
            "re_cycle_gan_semantic_mask: the CycleGAN path has no semantic "
            "heads in this framework — use re_cut_semantic_mask (same "
            "next-frame regularization with full mask semantics) or plain "
            "re_cycle_gan")
    if name in ("cm", "cm_gan"):
        from .cm_model import CMModel
        return CMModel(opt, phase=phase)
    if name in ("sc",):
        from .sc_model import SCModel
        return SCModel(opt, phase=phase)
    if name in ("b2b",):
        from .b2b_model import B2BModel
        return B2BModel(opt, phase=phase)
    if name in ("segmentation",):
        from .segmentation_model import SegmentationModel
        return SegmentationModel(opt, phase=phase)
    if name in ("test",):
        from .test_model import TestModel
        return TestModel(opt, phase=phase)
    if name in ("mat",):
        from .mat_model import MATModel
        return MATModel(opt, phase=phase)
    raise NotImplementedError(f"model type {name}")
