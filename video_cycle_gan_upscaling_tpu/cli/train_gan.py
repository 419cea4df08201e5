"""SRGAN trainer on cgc crops (reference: upscaling/train_gan.py).

Defaults parity: resnet-att generator, simple-512 discriminator with log-
sigmoid activation, wasserstein adv loss, dlw=1e-10, bs=2, 400,001
batches, 512-crops (train_gan.py:42-64). One fused jitted step replaces
the reference's three device trips (SURVEY.md §3.2)."""

from video_cycle_gan_upscaling_tpu.cli.common import Run, build_parser, config_from_args
from video_cycle_gan_upscaling_tpu.cli.trainers import run_gan

GAN_METRICS = ["loss_disc", "loss_gan_gen", "loss_gan_disc", "loss_gan_total",
               "d_real_mean", "d_fake_mean"]


def main(argv=None):
    parser = build_parser("gan", defaults=dict(
        generator_model="resnet-att", discriminator_model="simple-512",
        discriminator_activation="log", content_loss="vgg-only",
        discriminator_loss="wasserstein", discriminator_loss_weight=1e-10,
        batch_size=2, number_of_batches=400001,
        output_height=512, output_width=512))
    args = parser.parse_args(argv)
    cfg = config_from_args(args, "gan")
    run = Run(cfg, GAN_METRICS, args.vgg_weights, resume=args.resume)
    return run_gan(run)


if __name__ == "__main__":
    main()
