# Kvasir-SEG polyp segmentation (same structure as the reference config;
# point data_root at your local copy of the dataset).
dataset = dict(train=dict(type='KvasirSegDataset',
                          data_root='/sharespace/datasets/Kvasir-SEG/',
                          img_dir='images',
                          ann_dir='masks',
                          pipeline='configs/augmentation/kvasir_train_transform.yaml',
                          classes=['background', 'polyp'],
                          ignore_index=-1,
                          seg_map_suffix='.jpg'),
               val=dict(type='KvasirSegDataset',
                        data_root='/sharespace/datasets/Kvasir-SEG/',
                        img_dir='images',
                        ann_dir='masks',
                        pipeline='configs/augmentation/kvasir_val_transform.yaml',
                        classes=['background', 'polyp'],
                        ignore_index=-1,
                        return_ori_seg_gt=True,
                        seg_map_suffix='.jpg'),
               # NOTE: the reference normalizes the test split with ImageNet
               # stats while train/val use Kvasir stats (a distribution
               # shift); this config uses the Kvasir val pipeline instead.
               test=dict(type='KvasirSegDataset',
                         data_root='/sharespace/datasets/Kvasir-SEG/',
                         img_dir='images',
                         ann_dir='masks',
                         pipeline='configs/augmentation/kvasir_val_transform.yaml'))
