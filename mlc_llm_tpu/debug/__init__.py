"""Debug utilities (cross-path differential comparison)."""
