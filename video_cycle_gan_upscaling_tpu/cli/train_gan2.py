"""SRGAN trainer, inception-generator variant (reference:
upscaling/train_gan2.py — whose committed line 1 is a SyntaxError; this is
the working equivalent). Defaults parity: inc-resnet generator, sparse-512
discriminator, dlw=1e-5 (train_gan2.py:245-261)."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.train_gan import GAN_METRICS
from video_cycle_gan_upscaling_tpu.cli.trainers import run_gan


def main(argv=None):
    parser = build_parser("gan", defaults=dict(
        generator_model="inc-resnet", discriminator_model="sparse-512",
        discriminator_activation="none", content_loss="vgg-only",
        discriminator_loss="wasserstein", discriminator_loss_weight=1e-5,
        batch_size=2, number_of_batches=400001,
        output_height=512, output_width=512))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "gan")
    run = Run(cfg, GAN_METRICS, args.vgg_weights, resume=args.resume)
    return run_gan(run)


if __name__ == "__main__":
    main()
