from rick_tpu.utils.images import save_image_grid

__all__ = ["save_image_grid"]
