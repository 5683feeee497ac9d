"""Table loaders and bronze "readings" derivations."""
