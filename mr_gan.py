#!/usr/bin/env python3
"""Entry point preserving the reference CLI: python mr_gan.py --tables 1 3 5 6.

Semi-supervised feature-matching GAN table sweeps (reference mr_gan.py:236-342),
executed as fused, mesh-sharded XLA programs. See mrgan_tpu/cli/tables.py.
"""

from mrgan_tpu.cli.tables import gan_main

if __name__ == "__main__":
    gan_main()


def mr_gan(X, y, percentlabeled=50, percentunlabeled=None, epochs=None,
           trainTestSets=None, verbose=False, **kw):
    """Reference function API (`from mr_gan import mr_gan`): see
    mrgan_tpu.train.protocol.mr_gan."""
    from mrgan_tpu.train import protocol

    return protocol.mr_gan(X, y, percentlabeled=percentlabeled,
                           percentunlabeled=percentunlabeled, epochs=epochs,
                           trainTestSets=trainTestSets, verbose=verbose, **kw)
