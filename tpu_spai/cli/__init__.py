"""CLI entry points (train / infer / cond), hydra-style key=value CLIs."""
