#!/usr/bin/env python3
"""Entry point mirroring others/mr_gan_autoencoder.py: semi-supervised GAN
with dense-autoencoder pretraining on raw contact waveforms (modality 3 in
that variant returns raw audio; encoderNodes [1024, 512, 256] at :309).

    python mr_gan_autoencoder.py --tables 1 [--synthetic]
"""

from mrgan_tpu.cli.autoencoder import main

if __name__ == "__main__":
    main()
