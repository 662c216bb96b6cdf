from heybuddy_tpu.models.vits.synthesizer import (
    VitsConfig,
    init_params,
    infer,
    import_torch_checkpoint,
)

__all__ = ["VitsConfig", "init_params", "infer", "import_torch_checkpoint"]
