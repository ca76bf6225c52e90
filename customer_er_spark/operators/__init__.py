"""Pipeline operators: signatures, LSH banding/candidates, verification,
connected components, plus the training-data-pipeline operator library
(dedup variants, similarity search, text analysis, multimodal plumbing).
"""
