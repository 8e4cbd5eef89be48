"""Multi-device scaling: batched worlds over a device mesh."""
