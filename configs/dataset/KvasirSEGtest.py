# Kvasir-SEGtest: train/val on a pre-split copy, test on the full set —
# byte-level structural parity with the reference config of the same path
# (/root/reference/configs/dataset/KvasirSEGtest.py), ImageNet-stat
# "defautlt" [sic] pipelines included.
dataset = dict(train=dict(type='KvasirSegDataset',
                          data_root='/sharespace/datasets/Kvasir-SEGtest/',
                          img_dir='images/train',
                          ann_dir='masks/train',
                          pipeline='configs/augmentation/defautlt_training_transform.yaml',
                          classes=['background', 'polyp'],
                          ignore_index=-1,
                          seg_map_suffix='.jpg'
                          ),
               val=dict(type='KvasirSegDataset',
                        data_root='/sharespace/datasets/Kvasir-SEGtest/',
                        img_dir='images/val',
                        ann_dir='masks/val',
                        pipeline='configs/augmentation/defautlt_val_transform.yaml',
                        classes=['background', 'polyp'],
                        ignore_index=-1,
                        return_ori_seg_gt=True,
                        seg_map_suffix='.jpg'),
               test=dict(type='KvasirSegDataset',
                         data_root='/sharespace/datasets/Kvasir-SEG/',
                         img_dir='images',
                         ann_dir='masks',
                         pipeline='configs/augmentation/defautlt_training_transform.yaml'))
