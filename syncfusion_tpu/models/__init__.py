"""Model zoo: diffusion UNet, onset encoder, video onset net, CLAP,
SpecVQGAN baseline stack."""
