"""The "flagship model": end-to-end jitted batch liftover step and its padded
batch representation."""
