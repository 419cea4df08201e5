"""Relativistic/Wasserstein GAN trainer (reference: upscaling/
train_gan3.py). Defaults parity: relativistic loss with -dla activation
flag (train_gan3.py:63, 276-278), resnet-att generator."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.train_gan import GAN_METRICS
from video_cycle_gan_upscaling_tpu.cli.trainers import run_gan


def main(argv=None):
    parser = build_parser("gan3", defaults=dict(
        generator_model="resnet-att", discriminator_model="simple-512",
        discriminator_activation="none", content_loss="vgg-only",
        discriminator_loss="relativistic", discriminator_loss_weight=1e-5,
        batch_size=2, number_of_batches=400001,
        output_height=512, output_width=512))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "gan3")
    run = Run(cfg, GAN_METRICS, args.vgg_weights, resume=args.resume)
    return run_gan(run)


if __name__ == "__main__":
    main()
