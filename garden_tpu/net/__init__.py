"""Client/server networking (reference layer 7, host-side by nature)."""
