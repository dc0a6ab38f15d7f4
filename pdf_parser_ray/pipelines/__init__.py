"""End-to-end pipelines over Ray Data Datasets."""
