from video_cycle_gan_upscaling_tpu.ops.codec import (  # noqa: F401
    uint8_to_unit,
    unit_to_uint8,
    image_to_array,
    array_to_image,
)
from video_cycle_gan_upscaling_tpu.ops.nn import (  # noqa: F401
    prelu,
    leaky_relu,
    instance_norm,
    same_conv,
    conv_transpose_same,
    resize_nearest,
    resize_bilinear,
    safe_atanh,
    center_crop_to,
)
