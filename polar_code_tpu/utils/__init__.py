from .seeding import seed_all, make_key, fold_key

__all__ = ["seed_all", "make_key", "fold_key"]
