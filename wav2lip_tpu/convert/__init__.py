from wav2lip_tpu.convert.torch_import import (
    import_generator,
    import_syncnet,
    import_discriminator,
    import_s3fd,
    import_fan,
    import_resnet_depth,
    load_torch_state_dict,
)

__all__ = [
    "import_generator",
    "import_syncnet",
    "import_discriminator",
    "import_s3fd",
    "import_fan",
    "import_resnet_depth",
    "load_torch_state_dict",
]
