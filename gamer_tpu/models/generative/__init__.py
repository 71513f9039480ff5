from gamer_tpu.models.generative.qwen_family import (
    QwenFamilyConfig,
    QwenFamilyModel,
    QWEN_FAMILY_PRESETS,
    prepare_train_inputs,
)

__all__ = [
    "QwenFamilyConfig",
    "QwenFamilyModel",
    "QWEN_FAMILY_PRESETS",
    "prepare_train_inputs",
]
