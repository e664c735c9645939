"""Variant model family (the reference's others/ directory, SURVEY.md C8-C11):

- ``wgan``        WGAN-LP-CT semi-supervised trainer (wganlpctsemi.py:141-507)
- ``baselines``   resnet-MLP / biLSTM / SVM-kernel / random-forest baselines
                  (wganlpctsemi.py:161-221)
- ``autoencoder`` dense autoencoder pretraining + GAN on encoded features
                  (others/mr_gan_autoencoder.py)
- ``activation_maps`` input-gradient saliency on the MLP
                  (others/mr_nn_activation_map.py)
"""
