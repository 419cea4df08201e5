from video_cycle_gan_upscaling_tpu.models.generators import (  # noqa: F401
    UpscalerOrig,
    UpscalerAttention,
    UpscalerSkipCon,
    UpscalerIncepResnet,
    UpscalerUnetish,
    UpscalerUnetishAdd,
    UpscalerUnetishComplex,
    CycleGanResnetGenerator,
    make_generator,
)
from video_cycle_gan_upscaling_tpu.models.discriminators import (  # noqa: F401
    DiscriminatorSimple512,
    DiscriminatorThin512,
    DiscriminatorSparse512,
    PatchGanDiscriminator,
    make_discriminator,
)
