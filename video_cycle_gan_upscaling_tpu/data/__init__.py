from video_cycle_gan_upscaling_tpu.data.dataset import (  # noqa: F401
    load_images_from_dir,
    load_images_from_dir_and_downscale,
    downscale_images,
    crop_images,
    crop_images_cgc,
    join_cgc,
    split_images_train_test,
    select_random_rows,
)
from video_cycle_gan_upscaling_tpu.data.pipeline import (  # noqa: F401
    PairBatcher,
    CgcBatcher,
    UnpairedBatcher,
    prefetch_to_device,
)
