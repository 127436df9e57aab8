"""Training loops and losses (GLN, DIHE, GAN pretrain)."""
