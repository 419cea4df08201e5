from video_cycle_gan_upscaling_tpu.losses.content import (  # noqa: F401
    pixel_mse,
    pixel_mae,
    make_content_loss,
    make_content_loss_per_example,
)
from video_cycle_gan_upscaling_tpu.losses.adversarial import (  # noqa: F401
    wasserstein_loss,
    loss_activation,
    wasserstein_pair_losses,
    relativistic_pair_losses,
    lsgan_pair_losses,
    make_adversarial_losses,
)
