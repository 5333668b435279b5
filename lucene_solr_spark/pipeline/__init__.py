"""Large-scale training-data pipeline operators (task brief): deduplication,
similarity search, text analysis/quality, multimodal column plumbing.
These go beyond the reference's surface and are first-class components.
"""
