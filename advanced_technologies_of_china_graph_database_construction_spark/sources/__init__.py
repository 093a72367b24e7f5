from . import txt_records

__all__ = ["txt_records"]
