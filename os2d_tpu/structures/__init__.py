from .feature_map import FeatureMapSize, feature_map_size_for_image, exact_resize_area
from .boxes import (
    box_area,
    box_iou,
    box_intersection_over_reference,
    clip_boxes_to_image,
    clip_to_min_size,
    encode_boxes,
    decode_boxes,
    match_anchors,
    BOX_ENCODING_WEIGHTS,
    BBOX_XFORM_CLIP,
    convert_boxes,
    mask_empty_boxes,
)
