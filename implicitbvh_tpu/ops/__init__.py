from .tile_contact import tile_pair_contacts

__all__ = ["tile_pair_contacts"]
