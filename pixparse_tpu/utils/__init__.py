from pixparse_tpu.utils.json_utils import json2token, token2json, JSONParseEvaluator
from pixparse_tpu.utils.metrics import (
    average_normalized_levenshtein_similarity,
    normalized_levenshtein,
    similarity_score,
)
from pixparse_tpu.utils.name_utils import clean_name, natural_key
from pixparse_tpu.utils.text_metrics import (
    cer_metric,
    wer_metric,
    get_cer_wer_metrics,
)
from pixparse_tpu.utils.tree_edit import TreeNode, tree_edit_distance
