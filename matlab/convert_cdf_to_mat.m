% Batch-convert Human3.6M pose .cdf files to .cdf.mat so Python (scipy.io)
% can read them.  Equivalent purpose to the reference's data/convert_cdf_to_mat.m;
% only needed if you cannot use the cdflib path
% (python -m videopose3d_tpu.data.prepare.h36m_3d --from-source-cdf).
%
% Usage: place this file next to a "pose/" directory laid out as
%   pose/S1/MyPoseFeatures/D3_Positions/*.cdf
% and run it from MATLAB.  Each <name>.cdf gains a sibling <name>.cdf.mat
% holding the variable "data".

files = dir(fullfile('pose', '**', '*.cdf'));
for i = 1:numel(files)
    src = fullfile(files(i).folder, files(i).name);
    dst = [src '.mat'];
    if exist(dst, 'file')
        continue
    end
    fprintf('converting %s\n', src);
    data = cdfread(src);
    save(dst, 'data');
end
fprintf('done: %d files\n', numel(files));
