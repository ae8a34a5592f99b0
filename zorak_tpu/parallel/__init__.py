from .batch import BatchRenderer, render_batch, catalog_batch_render
