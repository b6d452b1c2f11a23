from dgll_tpu.dataloader.dataloader import DataLoader

__all__ = ["DataLoader"]
