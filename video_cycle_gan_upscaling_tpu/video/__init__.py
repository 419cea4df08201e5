from video_cycle_gan_upscaling_tpu.video.tiles import (  # noqa: F401
    plan_tiles,
    tile_windows,
    split_tiles,
    merge_tiles,
    make_tiled_upscaler,
)
from video_cycle_gan_upscaling_tpu.video.metrics import psnr, ssim  # noqa: F401
