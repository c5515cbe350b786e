from sfd2_tpu.pipeline.extract import Extractor, ExtractionConfig, EXTRACTION_CONFS
